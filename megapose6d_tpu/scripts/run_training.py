"""Training CLI.

Re-design of the reference's `scripts/run_megapose_training.py:298-341`:
`config_id` presets + `key=value` dotlist overrides.

Usage:
    python -m megapose6d_tpu.scripts.run_training config_id=refiner \\
        train_datasets=webdataset.gso,webdataset.shapenet \\
        batch_size=16 n_epochs=700
    python -m megapose6d_tpu.scripts.run_training config_id=coarse debug=1
    # Synthetic smoke run (no datasets needed):
    python -m megapose6d_tpu.scripts.run_training config_id=refiner \\
        synthetic=1 n_epochs=2
"""

from __future__ import annotations

import dataclasses
import sys

import jax

from ..data.datasets_cfg import make_object_dataset
from ..data.loader import ParallelBatchLoader, PoseBatchFactory
from ..meshes.mesh_db import MeshDataBase
from ..models.pose_predictor import PosePredictor, PosePredictorConfig
from ..parallel.mesh import make_mesh
from ..training.config import (
    TrainingConfig,
    apply_overrides,
    make_coarse_cfg,
    make_refiner_cfg,
    update_cfg_debug,
)
from ..training.train import synthetic_batch_fn, train
from ..utils.logging import get_logger

logger = get_logger(__name__)


def main(argv=None):
    from ..utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    # Pull out meta-args not in TrainingConfig.
    meta = {"config_id": "refiner", "debug": "0", "synthetic": "0",
            "object_dataset": ""}
    rest = []
    for a in argv:
        k = a.split("=", 1)[0]
        if k in meta:
            meta[k] = a.split("=", 1)[1]
        else:
            rest.append(a)

    cfg = TrainingConfig()
    if meta["config_id"].startswith("refiner"):
        cfg = make_refiner_cfg(cfg)
        cfg = dataclasses.replace(cfg, run_id=f"{meta['config_id']}-run")
    elif meta["config_id"].startswith("coarse"):
        cfg = make_coarse_cfg(cfg)
        cfg = dataclasses.replace(cfg, run_id=f"{meta['config_id']}-run")
    else:
        raise ValueError(meta["config_id"])
    cfg = apply_overrides(cfg, rest)
    if cfg.resume_run_id:
        # Reference semantics (run_megapose_training.py:315-320): a resumed
        # run reloads its persisted config, then CLI overrides re-apply.
        from pathlib import Path

        from ..training.config import load_config

        saved = Path(cfg.run_dir) / cfg.resume_run_id / "config.json"
        resume_id = cfg.resume_run_id
        cfg = apply_overrides(load_config(saved), rest)
        cfg = dataclasses.replace(cfg, resume_run_id=resume_id)
    if meta["debug"] == "1":
        cfg = update_cfg_debug(cfg)

    model = PosePredictor(PosePredictorConfig(**cfg.model_config_kwargs()))
    # Data-parallel mesh: largest device count dividing the batch.
    n_dev = len(jax.devices())
    while cfg.batch_size % n_dev:
        n_dev -= 1
    device_mesh = make_mesh(n_dev)
    logger.info(f"devices: {jax.devices()[:n_dev]}; config: {cfg}")

    loader = None
    if meta["synthetic"] == "1":
        # On-device synthetic scenes of procedural objects (smoke runs).
        from ..meshes.mesh_db import RigidObject, RigidObjectDataset
        from ..meshes.io import make_cube, make_uv_sphere

        objs = RigidObjectDataset(
            [
                RigidObject(label="cube", mesh=make_cube(0.04)),
                RigidObject(label="sphere", mesh=make_uv_sphere(0.04)),
            ]
        )
        mesh_db = MeshDataBase.from_object_ds(
            objs, max_faces=cfg.max_faces, n_points=cfg.n_points_mesh,
            n_sym=cfg.n_sym,
        ).batched()
        batch_fn = jax.jit(
            synthetic_batch_fn(mesh_db, cfg.batch_size, tuple(cfg.input_resize))
        )

        def batches():
            key = jax.random.PRNGKey(cfg.seed)
            while True:
                key, sub = jax.random.split(key)
                yield batch_fn(sub)

        batch_iter = batches()
        input_res = tuple(cfg.input_resize)
    else:
        assert cfg.train_datasets, "set train_datasets=... or synthetic=1"
        obj_name = meta["object_dataset"] or cfg.train_datasets[0]
        object_ds = make_object_dataset(obj_name)
        if cfg.n_max_objects:
            object_ds = object_ds.filter_objects(
                set(object_ds.labels[: cfg.n_max_objects])
            )
        mesh_db = MeshDataBase.from_object_ds(
            object_ds, max_faces=cfg.max_faces,
            n_points=cfg.n_points_mesh, n_sym=cfg.n_sym,
        ).batched()
        # Parallel host input pipeline (train_megapose.py:170-178 analog):
        # cfg.n_dataloader_workers processes decode/augment/collate batches
        # into a prefetch queue; workers=0 runs inline.
        factory = PoseBatchFactory(
            dataset_names=tuple(cfg.train_datasets),
            labels=tuple(mesh_db.labels),
            batch_size=cfg.batch_size,
            resize=tuple(cfg.input_resize),
            input_depth=cfg.input_depth,
            min_area=cfg.min_area,
        )
        loader = ParallelBatchLoader(
            factory, n_workers=cfg.n_dataloader_workers, seed=cfg.seed
        )
        batch_iter = iter(loader)
        input_res = tuple(cfg.input_resize)

    try:
        train(
            cfg,
            model,
            mesh_db,
            batch_iter,
            device_mesh=device_mesh,
            input_res=input_res,
            log_fn=lambda log: logger.info(str(log)),
        )
    finally:
        if loader is not None:
            loader.close()


if __name__ == "__main__":
    main()
