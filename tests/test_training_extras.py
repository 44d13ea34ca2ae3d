import json

import jax
import numpy as np
import pytest

from megapose6d_tpu.meshes import (
    MeshDataBase,
    RigidObject,
    RigidObjectDataset,
    make_cube,
    make_uv_sphere,
)


@pytest.fixture(scope="module")
def mesh_db():
    objs = RigidObjectDataset(
        [
            RigidObject(label="cube", mesh=make_cube(0.04)),
            RigidObject(label="sphere", mesh=make_uv_sphere(0.035, 8, 12)),
        ]
    )
    return MeshDataBase.from_object_ds(
        objs, max_faces=256, n_points=64, n_sym=2
    ).batched(align=32)


@pytest.mark.slow
def test_debug_visualization(mesh_db, tmp_path):
    from megapose6d_tpu.models import PosePredictor, make_refiner_config
    from megapose6d_tpu.training import synthetic_batch_fn
    from megapose6d_tpu.training.visualization import make_debug_visualization

    cfg = make_refiner_config(
        render_size=(32, 48), n_rendered_views=1,
        multiview_type="TCO+front_1view", face_chunk=32,
    )
    model = PosePredictor(cfg)
    batch = synthetic_batch_fn(mesh_db, 2, (48, 64), f=100.0, face_chunk=32)(
        jax.random.PRNGKey(0)
    )
    meshes1 = mesh_db.select(batch.mesh_idx[:1])
    params = model.init(
        jax.random.PRNGKey(0), batch.rgbs[:1], batch.K[:1], batch.TCO[:1],
        meshes1,
    )
    grid = make_debug_visualization(
        params, model, batch, mesh_db, tmp_path / "vis.png", max_samples=2
    )
    assert (tmp_path / "vis.png").exists()
    assert grid.max() > 10  # something rendered


@pytest.mark.slow
def test_detector_training_script(tmp_path, monkeypatch):
    from megapose6d_tpu.scripts.run_detector_training import main

    monkeypatch.chdir(tmp_path)
    main(
        [
            "run_id=det_smoke",
            "n_steps=2",
            "batch_size=2",
            "resolution=48,64",
            "n_obj_per_scene=1",
            "width=8",
            "log_every=1",
        ]
    )
    run_dir = tmp_path / "runs" / "det_smoke"
    lines = (run_dir / "log.txt").read_text().strip().splitlines()
    assert len(lines) == 2
    log = json.loads(lines[-1])
    assert np.isfinite(log["loss"])
    assert (run_dir / "labels.json").exists()
    assert (run_dir / "checkpoints" / "final").exists()
