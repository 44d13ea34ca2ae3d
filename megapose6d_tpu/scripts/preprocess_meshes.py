"""Mesh preprocessing CLI: object set -> padded device mesh-DB cache.

The reference ships a family of make_* scripts (panda3d .bam conversion,
ply scaling, pointcloud sampling — megapose6d: src/megapose/scripts/
make_shapenet_* / make_gso_*). Here preprocessing = load + decimate +
Morton-order + pad once, serialized to one .npz consumed directly by the
renderer/model.

Usage:
    python -m megapose6d_tpu.scripts.preprocess_meshes \\
        source=bop:ycbv out=ycbv_meshdb.npz max_faces=4096
    python -m megapose6d_tpu.scripts.preprocess_meshes \\
        source=gso:/path/to/gso out=gso.npz n_objects=100
"""

from __future__ import annotations

import sys

from ..meshes.mesh_db import MeshDataBase, save_batched_meshes
from ..utils.logging import get_logger

logger = get_logger(__name__)


def main(argv=None):
    args = dict(
        source="", out="meshdb.npz", max_faces="4096", n_points="2000",
        n_sym="32", n_objects="0",
    )
    for a in sys.argv[1:] if argv is None else argv:
        k, _, v = a.partition("=")
        assert k in args, f"unknown arg {k}"
        args[k] = v

    kind, _, spec = args["source"].partition(":")
    n_obj = int(args["n_objects"]) or None
    if kind == "bop":
        from ..data.datasets_cfg import make_object_dataset

        objects = make_object_dataset(spec)
    elif kind == "gso":
        from ..data.object_datasets import make_gso_object_dataset

        objects = make_gso_object_dataset(spec, n_objects=n_obj)
    elif kind == "shapenet":
        from ..data.object_datasets import make_shapenet_object_dataset

        objects = make_shapenet_object_dataset(spec, n_objects=n_obj)
    elif kind == "dir":
        from ..data.object_datasets import make_directory_object_dataset

        objects = make_directory_object_dataset(spec)
    else:
        raise ValueError(f"unknown source kind: {kind!r}")

    logger.info(f"loading + preprocessing {len(objects)} meshes...")
    db = MeshDataBase.from_object_ds(
        objects,
        max_faces=int(args["max_faces"]),
        n_points=int(args["n_points"]),
        n_sym=int(args["n_sym"]),
    )
    batched = db.batched()
    save_batched_meshes(args["out"], batched)
    logger.info(
        f"wrote {args['out']}: {batched.n_labels} objects, "
        f"V={batched.vertices.shape[1]}, F={batched.faces.shape[1]}"
    )


if __name__ == "__main__":
    main()
