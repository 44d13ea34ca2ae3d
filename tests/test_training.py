import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megapose6d_tpu.meshes import (
    MeshDataBase,
    RigidObject,
    RigidObjectDataset,
    make_cube,
    make_uv_sphere,
)
from megapose6d_tpu.models import PosePredictor, PosePredictorConfig
from megapose6d_tpu.parallel import make_mesh, shard_batch
from megapose6d_tpu.training import (
    BatchPoseData,
    TrainingConfig,
    apply_overrides,
    create_train_state,
    forward_loss,
    load_checkpoint,
    make_coarse_cfg,
    make_hypotheses,
    make_refiner_cfg,
    make_train_step,
    save_checkpoint,
    synthetic_batch_fn,
)

INPUT = (60, 80)
RENDER = (48, 64)


@pytest.fixture(scope="module")
def mesh_db():
    objs = RigidObjectDataset(
        [
            RigidObject(label="cube", mesh=make_cube(0.04)),
            RigidObject(label="sphere", mesh=make_uv_sphere(0.035, 8, 12)),
        ]
    )
    db = MeshDataBase.from_object_ds(objs, max_faces=256, n_points=64, n_sym=2)
    return db.batched(align=32)


def small_cfg(**kw):
    base = TrainingConfig(
        input_resize=INPUT,
        render_size=RENDER,
        batch_size=2,
        epoch_size=4,
        n_epochs_warmup=1,
        lr_epoch_decay=100,
        n_points_loss=32,
        n_iterations=1,
    )
    return dataclasses.replace(base, **kw)


def test_cli_overrides():
    cfg = TrainingConfig()
    cfg = apply_overrides(
        cfg, ["lr=0.001", "batch_size=8", "render_normals=false",
              "init_trans_std=0.02,0.02,0.1"]
    )
    assert cfg.lr == 0.001 and cfg.batch_size == 8
    assert cfg.render_normals is False
    assert cfg.init_trans_std == (0.02, 0.02, 0.1)


def test_synthetic_batch(mesh_db):
    fn = synthetic_batch_fn(mesh_db, 4, INPUT, f=120.0, face_chunk=32)
    batch = jax.jit(fn)(jax.random.PRNGKey(0))
    assert batch.rgbs.shape == (4,) + INPUT + (3,)
    assert batch.TCO.shape == (4, 4, 4)
    # Rendered observations are non-empty and bboxes sane.
    assert (np.asarray(batch.rgbs).max(axis=(1, 2, 3)) > 0.1).all()
    b = np.asarray(batch.bboxes)
    assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()


def test_hypotheses_refiner_noise(mesh_db):
    cfg = small_cfg(hypotheses_init_method="refiner_gt+noise", n_hypotheses=3)
    fn = synthetic_batch_fn(mesh_db, 2, INPUT, f=120.0, face_chunk=32)
    batch = fn(jax.random.PRNGKey(0))
    meshes = mesh_db.select(batch.mesh_idx)
    TCO_init, pos = make_hypotheses(jax.random.PRNGKey(1), cfg, batch, meshes)
    assert TCO_init.shape == (2, 3, 4, 4) and pos is None
    # Noised poses stay near GT.
    d = np.linalg.norm(
        np.asarray(TCO_init[:, :, :3, 3] - batch.TCO[:, None, :3, 3]), axis=-1
    )
    assert (d < 0.5).all() and (d > 0).all()


@pytest.mark.slow
def test_hypotheses_coarse_multiview(mesh_db):
    cfg = small_cfg(
        hypotheses_init_method="coarse_classif_multiview_paper",
        n_hypotheses=6,
    )
    fn = synthetic_batch_fn(mesh_db, 4, INPUT, f=120.0, face_chunk=32)
    batch = fn(jax.random.PRNGKey(0))
    meshes = mesh_db.select(batch.mesh_idx)
    TCO_init, pos = make_hypotheses(jax.random.PRNGKey(2), cfg, batch, meshes)
    assert TCO_init.shape == (4, 6, 4, 4)
    assert pos.shape == (4, 6)
    assert set(np.unique(np.asarray(pos))).issubset({0.0, 1.0})
    # At most one positive per sample (view 0 appears at most once).
    assert (np.asarray(pos).sum(1) <= 1).all()


def test_hypotheses_coarse_grid(mesh_db):
    from megapose6d_tpu.ops.se3 import geodesic_distance

    cfg = small_cfg(
        hypotheses_init_method="coarse_classif_grid",
        n_hypotheses=6,
        coarse_pos_angle_deg=30.0,
    )
    fn = synthetic_batch_fn(mesh_db, 8, INPUT, f=120.0, face_chunk=32)
    batch = fn(jax.random.PRNGKey(0))
    meshes = mesh_db.select(batch.mesh_idx)
    TCO_init, pos = jax.jit(
        lambda k: make_hypotheses(k, cfg, batch, meshes)
    )(jax.random.PRNGKey(3))
    assert TCO_init.shape == (8, 6, 4, 4) and pos.shape == (8, 6)

    R_hyp = np.asarray(TCO_init[..., :3, :3])
    assert np.allclose(np.linalg.det(R_hyp), 1.0, atol=1e-4)

    # Labels must agree with the symmetry-aware angular threshold.
    R_sym = np.einsum(
        "bij,bsjk->bsik",
        np.asarray(batch.TCO[:, :3, :3]),
        np.asarray(meshes.symmetries[:, :, :3, :3]),
    )
    d = np.asarray(
        geodesic_distance(
            jnp.asarray(R_hyp)[:, :, None], jnp.asarray(R_sym)[:, None]
        )
    )
    d = np.where(np.asarray(meshes.sym_valid)[:, None, :], d, np.inf).min(-1)
    expect = (d <= np.radians(30.0)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(pos), expect)

    # Translation is box-fitted: identical detection box => the projected
    # silhouette must land inside (roughly) the same box for every
    # hypothesis, positive or negative — no frustum shortcut.
    from megapose6d_tpu.ops.camera import project_points

    pts = np.asarray(meshes.points)  # [B, P, 3]
    for b in range(2):
        for h in range(6):
            uv = np.asarray(
                project_points(
                    jnp.asarray(pts[b][None]),
                    jnp.asarray(batch.K[b][None]),
                    jnp.asarray(TCO_init[b, h][None]),
                )
            )[0]
            box = np.asarray(batch.bboxes[b])
            cx_box = (box[0] + box[2]) / 2
            cy_box = (box[1] + box[3]) / 2
            w_box = box[2] - box[0]
            assert abs(uv[:, 0].mean() - cx_box) < w_box
            assert abs(uv[:, 1].mean() - cy_box) < w_box

    # With force prob 0.7 over 8 samples, some positives must exist.
    assert np.asarray(pos).sum() >= 1


def test_hypotheses_coarse_grid_hard_negatives(mesh_db):
    from megapose6d_tpu.ops.se3 import geodesic_distance

    cfg = small_cfg(
        hypotheses_init_method="coarse_classif_grid",
        n_hypotheses=8,
        coarse_pos_angle_deg=30.0,
        coarse_hard_neg_frac=1.0,
        coarse_hard_neg_max_deg=90.0,
    )
    fn = synthetic_batch_fn(mesh_db, 8, INPUT, f=120.0, face_chunk=32)
    batch = fn(jax.random.PRNGKey(0))
    meshes = mesh_db.select(batch.mesh_idx)
    TCO_init, pos = make_hypotheses(
        jax.random.PRNGKey(5), cfg, batch, meshes
    )
    # Every candidate is GT-composed with angle <= 90 deg (geodesic to
    # the raw GT rotation, before any symmetry reduction).
    d = np.degrees(
        np.asarray(
            geodesic_distance(
                TCO_init[..., :3, :3], batch.TCO[:, None, :3, :3]
            )
        )
    )
    assert d.max() <= 90.0 + 1e-3
    # The boundary region gets real coverage: candidates on both sides.
    assert (d <= 30.0).sum() >= 2 and (d > 30.0).sum() >= 2


@pytest.mark.slow
def test_refiner_train_step_decreases_loss(mesh_db):
    # Large init noise so the loss starts well above the identity-update
    # floor (the pose head initializes to the identity update).
    cfg = make_refiner_cfg(
        small_cfg(
            init_euler_deg_std=(40.0, 40.0, 40.0),
            init_trans_std=(0.04, 0.04, 0.12),
            lr=1e-3,
        )
    )
    cfg = dataclasses.replace(
        cfg, n_rendered_views=1, multiview_type="front_1view", n_iterations=1
    )
    model = PosePredictor(
        PosePredictorConfig(**cfg.model_config_kwargs(), face_chunk=32)
    )
    state = create_train_state(
        cfg, model, mesh_db, jax.random.PRNGKey(0), input_res=INPUT
    )
    step_fn = make_train_step(model, cfg, mesh_db)
    batch_fn = synthetic_batch_fn(mesh_db, 2, INPUT, f=120.0, face_chunk=32)
    batch = batch_fn(jax.random.PRNGKey(3))  # fixed batch: overfit signal

    losses = []
    for i in range(40):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(42), 1)
        losses.append(float(metrics["loss_total"]))
        assert np.isfinite(losses[-1])
    # Overfitting a single fixed batch with fixed noise must reduce loss.
    assert np.mean(losses[-5:]) < np.mean(losses[:3]), losses


@pytest.mark.slow
def test_coarse_train_step(mesh_db):
    cfg = make_coarse_cfg(small_cfg())
    cfg = dataclasses.replace(cfg, n_hypotheses=4)
    model = PosePredictor(
        PosePredictorConfig(**cfg.model_config_kwargs(), face_chunk=32)
    )
    state = create_train_state(
        cfg, model, mesh_db, jax.random.PRNGKey(0), input_res=INPUT
    )
    step_fn = make_train_step(model, cfg, mesh_db)
    batch_fn = synthetic_batch_fn(mesh_db, 2, INPUT, f=120.0, face_chunk=32)
    batch = batch_fn(jax.random.PRNGKey(3))
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(7), 1)
    assert "loss_renderings_confidence" in metrics
    assert np.isfinite(float(metrics["loss_total"]))


@pytest.mark.slow
def test_train_step_sharded_8_devices(mesh_db):
    """Data-parallel train step over the 8 virtual CPU devices."""
    assert len(jax.devices()) == 8
    cfg = make_refiner_cfg(small_cfg(batch_size=8))
    cfg = dataclasses.replace(
        cfg, n_rendered_views=1, multiview_type="front_1view", n_iterations=1
    )
    model = PosePredictor(
        PosePredictorConfig(**cfg.model_config_kwargs(), face_chunk=32)
    )
    state = create_train_state(
        cfg, model, mesh_db, jax.random.PRNGKey(0), input_res=INPUT
    )
    step_fn = make_train_step(model, cfg, mesh_db)
    batch_fn = synthetic_batch_fn(mesh_db, 8, INPUT, f=120.0, face_chunk=32)
    batch = batch_fn(jax.random.PRNGKey(3))

    mesh = make_mesh(8)
    batch = shard_batch(batch, mesh)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1), 1)
    assert np.isfinite(float(metrics["loss_total"]))
    # Batch really was sharded.
    assert len(batch.rgbs.sharding.device_set) == 8


@pytest.mark.slow
def test_checkpoint_roundtrip(mesh_db, tmp_path):
    cfg = make_refiner_cfg(small_cfg())
    cfg = dataclasses.replace(
        cfg, n_rendered_views=1, multiview_type="front_1view"
    )
    model = PosePredictor(
        PosePredictorConfig(**cfg.model_config_kwargs(), face_chunk=32)
    )
    state = create_train_state(
        cfg, model, mesh_db, jax.random.PRNGKey(0), input_res=INPUT
    )
    save_checkpoint(tmp_path, state, epoch=3)
    state2 = create_train_state(
        cfg, model, mesh_db, jax.random.PRNGKey(9), input_res=INPUT
    )
    state2, epoch = load_checkpoint(tmp_path, state2)
    assert epoch == 3
    chex_equal = jax.tree.map(
        lambda a, b: np.allclose(a, b), state.params, state2.params
    )
    assert all(jax.tree.leaves(chex_equal))
    # Pretrain-init path: weights only, optimizer/step fresh
    # (partial-restores from a full params+opt_state+step checkpoint).
    state3 = create_train_state(
        cfg, model, mesh_db, jax.random.PRNGKey(11), input_res=INPUT
    )
    state3, epoch3 = load_checkpoint(tmp_path, state3, params_only=True)
    assert epoch3 == 3 and int(state3.step) == 0
    chex_equal = jax.tree.map(
        lambda a, b: np.allclose(a, b), state.params, state3.params
    )
    assert all(jax.tree.leaves(chex_equal))


@pytest.mark.slow
def test_resume_matches_continuous_run(mesh_db, tmp_path):
    """Kill a run after epoch 2, resume from the checkpoint, and the
    remaining epochs' losses match a continuous run exactly (optimizer
    state + step + RNG stream all restored). Reference contract:
    resume_run_id, train_megapose.py:219-241 — this exceeds it by also
    restoring Adam moments."""
    from megapose6d_tpu.training import train

    def cfg_for(run_id, n_epochs):
        c = make_refiner_cfg(
            small_cfg(
                run_id=run_id,
                run_dir=str(tmp_path),
                save_epoch_interval=1,
                init_euler_deg_std=(30.0, 30.0, 30.0),
                lr=1e-3,
            )
        )
        return dataclasses.replace(
            c,
            n_rendered_views=1,
            multiview_type="front_1view",
            n_iterations=1,
            n_epochs=n_epochs,
        )

    def make_model(cfg):
        return PosePredictor(
            PosePredictorConfig(**cfg.model_config_kwargs(), face_chunk=32)
        )

    # Batch source deterministic in the GLOBAL step index, so the resumed
    # run sees the same batches the continuous run saw.
    batch_fn = synthetic_batch_fn(mesh_db, 2, INPUT, f=120.0, face_chunk=32)
    batch_fn = jax.jit(batch_fn)

    def batches(start_step):
        i = start_step
        while True:
            yield batch_fn(jax.random.fold_in(jax.random.PRNGKey(99), i))
            i += 1

    steps_per_epoch = 2  # epoch_size=4 / batch_size=2

    def read_log(run_id):
        lines = (tmp_path / run_id / "log.txt").read_text().splitlines()
        return {json.loads(l)["epoch"]: json.loads(l) for l in lines}

    # Continuous 4-epoch run.
    cfg_a = cfg_for("contin", 4)
    train(cfg_a, make_model(cfg_a), mesh_db, batches(0), input_res=INPUT)
    log_a = read_log("contin")

    # Interrupted run: 2 epochs...
    cfg_b = cfg_for("interrupted", 2)
    train(cfg_b, make_model(cfg_b), mesh_db, batches(0), input_res=INPUT)
    # ...then resume to 4 (fresh process state simulated by new model/state).
    cfg_b2 = dataclasses.replace(
        cfg_for("interrupted", 4), resume_run_id="interrupted"
    )
    train(
        cfg_b2,
        make_model(cfg_b2),
        mesh_db,
        batches(2 * steps_per_epoch),
        input_res=INPUT,
    )
    log_b = read_log("interrupted")

    assert sorted(log_b) == [1, 2, 3, 4]
    for epoch in (3, 4):
        np.testing.assert_allclose(
            log_b[epoch]["loss_total"],
            log_a[epoch]["loss_total"],
            rtol=1e-5,
            err_msg=f"epoch {epoch} diverged after resume",
        )


def test_synthetic_batch_renderer_paths_agree(mesh_db):
    """The tiled-kernel batch generator (TPU default) must produce the
    same batches as the scan baseline (CPU default)."""
    fn_scan = synthetic_batch_fn(
        mesh_db, 2, INPUT, f=120.0, face_chunk=32, renderer="scan"
    )
    fn_tiled = synthetic_batch_fn(
        mesh_db, 2, INPUT, f=120.0, face_chunk=32, renderer="tiled"
    )
    key = jax.random.PRNGKey(0)
    a, b = fn_scan(key), fn_tiled(key)
    np.testing.assert_allclose(
        np.asarray(a.rgbs), np.asarray(b.rgbs), atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(a.TCO), np.asarray(b.TCO))
    np.testing.assert_allclose(
        np.asarray(a.bboxes), np.asarray(b.bboxes), atol=1e-3
    )
