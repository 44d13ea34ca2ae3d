"""GSO / ShapeNet / ModelNet / directory object-dataset loaders.

Re-design of the reference's per-source object datasets (megapose6d:
src/megapose/datasets/gso_dataset.py, shapenet_object_dataset.py,
modelnet_object_dataset.py, urdf_dataset.py): directory scanners producing
`RigidObjectDataset`s with the reference's label conventions.
"""

from __future__ import annotations

from pathlib import Path

from ..meshes.mesh_db import RigidObject, RigidObjectDataset


def make_gso_object_dataset(
    gso_dir: str | Path, n_objects: int | None = None
) -> RigidObjectDataset:
    """Google Scanned Objects: `<gso_dir>/<name>/meshes/model.obj`
    (gso_dataset.py; labels `gso_<name>`)."""
    gso_dir = Path(gso_dir)
    objects = []
    for entry in sorted(gso_dir.iterdir()):
        mesh = entry / "meshes" / "model.obj"
        if mesh.exists():
            objects.append(
                RigidObject(
                    label=f"gso_{entry.name}", mesh_path=mesh, mesh_units="m"
                )
            )
        if n_objects is not None and len(objects) >= n_objects:
            break
    return RigidObjectDataset(objects)


def make_shapenet_object_dataset(
    shapenet_dir: str | Path,
    n_objects: int | None = None,
    taxonomy_filter: set[str] | None = None,
) -> RigidObjectDataset:
    """ShapeNetCore v2 layout: `<dir>/<synset>/<model>/models/
    model_normalized.obj` (shapenet_object_dataset.py; labels
    `shapenet_<synset>_<model>`)."""
    shapenet_dir = Path(shapenet_dir)
    objects = []
    for synset in sorted(shapenet_dir.iterdir()):
        if not synset.is_dir():
            continue
        if taxonomy_filter and synset.name not in taxonomy_filter:
            continue
        for model in sorted(synset.iterdir()):
            mesh = model / "models" / "model_normalized.obj"
            if mesh.exists():
                objects.append(
                    RigidObject(
                        label=f"shapenet_{synset.name}_{model.name}",
                        mesh_path=mesh,
                        mesh_units="m",
                    )
                )
            if n_objects is not None and len(objects) >= n_objects:
                return RigidObjectDataset(objects)
    return RigidObjectDataset(objects)


def make_modelnet_object_dataset(
    modelnet_dir: str | Path,
    category: str,
    split: str = "test",
    n_objects: int | None = None,
    rescaled: bool = True,
) -> RigidObjectDataset:
    """ModelNet40 `<dir>/<category>/<split>/<category>_NNNN.obj`
    (modelnet_object_dataset.py; DeepIM evaluation categories)."""
    base = Path(modelnet_dir) / category / split
    objects = []
    for mesh in sorted(base.glob("*.obj")):
        objects.append(
            RigidObject(
                label=f"modelnet_{category}_{mesh.stem}",
                mesh_path=mesh,
                mesh_units="m",
            )
        )
        if n_objects is not None and len(objects) >= n_objects:
            break
    return RigidObjectDataset(objects)


def make_directory_object_dataset(
    mesh_dir: str | Path, mesh_units: str = "mm"
) -> RigidObjectDataset:
    """Flat directory of mesh files (urdf_dataset.py-style scan)."""
    mesh_dir = Path(mesh_dir)
    objects = []
    for mesh in sorted(mesh_dir.iterdir()):
        if mesh.suffix.lower() in (".ply", ".obj"):
            objects.append(
                RigidObject(
                    label=mesh.stem, mesh_path=mesh, mesh_units=mesh_units
                )
            )
    return RigidObjectDataset(objects)
