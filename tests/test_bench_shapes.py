"""Bench-shape compile guard (VERDICT r3 item 8).

Round 3's driver bench died with RESOURCE_EXHAUSTED the first time the
full bench shapes met the real chip, erasing the round's perf record.
This test compiles the SAME fused pipeline program bench.py measures
(D=8 detections, 576-rotation SO(3) grid, ~3k-face meshes, 240x320
renders) on CPU (interpret-mode Pallas), so structural/compile
regressions in the bench path are caught by the suite before the driver
bench meets the hardware. Mosaic VMEM budgeting is TPU-only and cannot
be checked here; the on-TPU smoke command lives in the verify skill
(.claude/skills/verify/SKILL.md).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


@pytest.mark.slow
def test_fused_pipeline_compiles_at_bench_shapes():
    import jax.numpy as jnp

    from megapose6d_tpu.data import ObservationTensor
    from megapose6d_tpu.inference import make_detections
    from megapose6d_tpu.ops import rasterizer

    mesh_db, mesh_db_coarse = bench.build_world()
    n_detections = 8
    est, K = bench.make_estimator(mesh_db, mesh_db_coarse, n_detections)

    img_res = (480, 640)
    TCO_gt = np.eye(4, dtype=np.float32)
    TCO_gt[2, 3] = 0.55
    meshes1 = mesh_db.select(jnp.zeros((1,), jnp.int32))
    obs_r = rasterizer.render_meshes(
        meshes1.vertices, meshes1.normals, meshes1.colors, meshes1.faces,
        meshes1.face_valid, jnp.asarray(TCO_gt)[None], jnp.asarray(K)[None],
        img_res, chunk=128, light_ambient=1.0, light_point=0.0,
    )
    obs = ObservationTensor(images=np.asarray(obs_r.rgb), K=K[None])
    boxes = np.tile(
        np.asarray([[265.0, 185.0, 375.0, 295.0]], np.float32),
        (n_detections, 1),
    )
    detections = make_detections(["obj1"] * n_detections, boxes)

    # Lower + compile the exact program bench_pipeline times (no
    # execution needed; a compile failure or shape error is the signal).
    cost = est.fused_pipeline_cost_analysis(obs, detections)
    assert cost.get("flops", 0) > 0 or len(cost) > 0

    # Trip-count-corrected model FLOPs (bench.py's MFU numerator): the
    # compiled program's cost analysis counts lax.map/scan bodies once,
    # so the corrected estimate must be strictly larger and decompose
    # into coarse + refine + rescore.
    est_flops = est.fused_pipeline_flops_estimate(obs)
    assert est_flops["flops"] == pytest.approx(
        est_flops["flops_coarse"] + est_flops["flops_refine"]
        + est_flops["flops_rescore"]
    )
    assert est_flops["flops"] > cost.get("flops", 0) > 0
    # Coarse sweep (576 hypotheses) dominates refine (top-4 x 5 iters).
    assert est_flops["flops_coarse"] > est_flops["flops_refine"]


@pytest.mark.slow
def test_pruned_pipeline_compiles_at_bench_shapes():
    """The hierarchical-pruning bench config (72-probe + top-8 children)
    — bench.py's headline candidate — must also compile at bench
    shapes."""
    import jax.numpy as jnp  # noqa: F401

    from megapose6d_tpu.data import ObservationTensor
    from megapose6d_tpu.inference import make_detections

    mesh_db, mesh_db_coarse = bench.build_world()
    n_detections = 8
    est, K = bench.make_estimator(
        mesh_db, mesh_db_coarse, n_detections, prune=72, prune_keep=8
    )
    obs = ObservationTensor(
        images=np.zeros((1, 480, 640, 3), np.float32), K=K[None]
    )
    boxes = np.tile(
        np.asarray([[265.0, 185.0, 375.0, 295.0]], np.float32),
        (n_detections, 1),
    )
    detections = make_detections(["obj1"] * n_detections, boxes)
    cost = est.fused_pipeline_cost_analysis(obs, detections)
    assert cost.get("flops", 0) > 0 or len(cost) > 0
    est_flops = est.fused_pipeline_flops_estimate(obs)
    # Hierarchy scores 72 probes + 8x8 children = 136 of 576 rotations
    # per detection: coarse flops must drop to ~1/4 of the full sweep's
    # 5.6e13 (same shapes as the first test).
    assert 0 < est_flops["flops_coarse"] < 2.5e13


@pytest.mark.slow
def test_coarse_res_pipeline_compiles_at_bench_shapes():
    """The low-res coarse-sweep bench config (coarse_render_size=120x160,
    bench.py's round-5 headline candidate) must compile at bench shapes;
    the Pallas raster path at 120x160 exercises the non-multiple-of-128
    width tile padding in interpret mode."""
    import jax.numpy as jnp  # noqa: F401

    from megapose6d_tpu.data import ObservationTensor
    from megapose6d_tpu.inference import make_detections

    mesh_db, mesh_db_coarse = bench.build_world()
    n_detections = 8
    est, K = bench.make_estimator(
        mesh_db, mesh_db_coarse, n_detections, coarse_res=(120, 160)
    )
    assert est.coarse_model_sweep.cfg.render_at == (120, 160)
    obs = ObservationTensor(
        images=np.zeros((1, 480, 640, 3), np.float32), K=K[None]
    )
    boxes = np.tile(
        np.asarray([[265.0, 185.0, 375.0, 295.0]], np.float32),
        (n_detections, 1),
    )
    detections = make_detections(["obj1"] * n_detections, boxes)
    cost = est.fused_pipeline_cost_analysis(obs, detections)
    assert cost.get("flops", 0) > 0 or len(cost) > 0


def test_ab_validation_gate():
    """_ab_validates: agreement >= 0.9 promotes; medians alone do NOT
    promote without a bounded per-frame tail (ADVICE r4: the 144/16
    prune A/B hid an 86 mm worst-frame ADD miss behind a 0.05 mm median
    delta)."""
    ok = {"top1_pose_agreement_frac": 0.94}
    assert bench._ab_validates(ok, "coarse_res")
    # Median-delta path requires the tail key AND a small tail.
    median_only = {
        "top1_pose_agreement_frac": 0.6,
        "rot_deg_full": 4.3, "rot_deg_pruned": 4.4,
    }
    assert not bench._ab_validates(median_only, "pruned")
    with_tail = dict(median_only, add_mm_worst_frame_delta=1.2)
    assert bench._ab_validates(with_tail, "pruned")
    bad_tail = dict(median_only, add_mm_worst_frame_delta=86.0)
    assert not bench._ab_validates(bad_tail, "pruned")
    assert not bench._ab_validates(None, "pruned")


def test_beam_reaches_inference_config():
    """The `beam` bench knob (combo A/B `top_k`: shrunk refiner beam)
    must reach InferenceConfig.n_pose_hypotheses; 0 keeps the default 5."""
    mesh_db, mesh_db_coarse = bench.build_world()
    est, _ = bench.make_estimator(mesh_db, mesh_db_coarse, 2, beam=2)
    assert est.cfg.n_pose_hypotheses == 2
    est5, _ = bench.make_estimator(mesh_db, mesh_db_coarse, 2)
    assert est5.cfg.n_pose_hypotheses == 5
