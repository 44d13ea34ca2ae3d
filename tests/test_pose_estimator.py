import jax
import jax.numpy as jnp
import numpy as np
import pytest

from megapose6d_tpu.data import ObservationTensor
from megapose6d_tpu.inference import InferenceConfig, PoseEstimator, make_detections
from megapose6d_tpu.meshes import (
    MeshDataBase,
    RigidObject,
    RigidObjectDataset,
    make_cube,
    make_uv_sphere,
)
from megapose6d_tpu.models import (
    PosePredictor,
    make_coarse_config,
    make_refiner_config,
)
from megapose6d_tpu.ops import rasterizer

RENDER = (48, 64)
IMG = (96, 128)


@pytest.fixture(scope="module")
def setup():
    objs = RigidObjectDataset(
        [
            RigidObject(label="cube", mesh=make_cube(0.04)),
            RigidObject(label="sphere", mesh=make_uv_sphere(0.035, 8, 12)),
        ]
    )
    db = MeshDataBase.from_object_ds(objs, max_faces=256, n_points=64, n_sym=2)
    mesh_db = db.batched(align=32)

    coarse_cfg = make_coarse_config(render_size=RENDER, face_chunk=32)
    refiner_cfg = make_refiner_config(
        render_size=RENDER, n_rendered_views=2,
        multiview_type="TCO+front_1view", face_chunk=32,
    )
    coarse = PosePredictor(coarse_cfg)
    refiner = PosePredictor(refiner_cfg)

    K = np.asarray([[130.0, 0, 64], [0, 130.0, 48], [0, 0, 1]], np.float32)
    TCO_gt = np.eye(4, dtype=np.float32)
    TCO_gt[2, 3] = 0.5
    meshes1 = mesh_db.select(mesh_db.label_to_index(["cube"]))
    obs_render = rasterizer.render_meshes(
        meshes1.vertices, meshes1.normals, meshes1.colors, meshes1.faces,
        meshes1.face_valid, jnp.asarray(TCO_gt)[None], jnp.asarray(K)[None],
        IMG, light_ambient=1.0, light_point=0.0,
    )
    obs = ObservationTensor(
        images=np.asarray(obs_render.rgb), K=K[None]
    )

    dummy_imgs = jnp.zeros((1,) + IMG + (3,), jnp.float32)
    dummy_T = jnp.asarray(TCO_gt)[None]
    cparams = coarse.init(
        jax.random.PRNGKey(0), dummy_imgs, jnp.asarray(K)[None], dummy_T, meshes1
    )
    rparams = refiner.init(
        jax.random.PRNGKey(1), dummy_imgs, jnp.asarray(K)[None], dummy_T, meshes1
    )

    cfg = InferenceConfig(
        SO3_grid_size=16,
        n_refiner_iterations=2,
        n_pose_hypotheses=3,
        bsz_images=16,
        bsz_objects=8,
        max_detections=4,
    )
    est = PoseEstimator(coarse, cparams, refiner, rparams, mesh_db, cfg)
    return est, obs, TCO_gt


def gt_detection_box(TCO_gt):
    # cube half extent 0.04 at z=0.5 with f=130 -> ~10.4 px half-size
    half = 130 * 0.04 / 0.46
    cx, cy = 64.0, 48.0
    return np.asarray(
        [[cx - half, cy - half, cx + half, cy + half]], np.float32
    )


@pytest.mark.slow
def test_pipeline_runs_and_shapes(setup):
    est, obs, TCO_gt = setup
    detections = make_detections(["cube"], gt_detection_box(TCO_gt))
    out, extra = est.run_inference_pipeline(obs, detections)
    assert len(out) == 1
    assert out.poses.shape == (1, 4, 4)
    assert np.isfinite(out.poses).all()
    assert "pose_score" in out.infos.columns
    assert extra["coarse"]["logits"].shape == (1, 16)
    assert extra["refiner"]["trajectory"].shape == (2, 1, 3, 4, 4)
    # Valid SE(3).
    R = out.poses[:, :3, :3]
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), np.eye(3)[None], atol=1e-4)
    assert est.timing_["total"] > 0


@pytest.mark.slow
def test_topk_consistent_with_logits(setup):
    est, obs, TCO_gt = setup
    detections = make_detections(["cube"], gt_detection_box(TCO_gt))
    out, extra = est.run_inference_pipeline(obs, detections)
    logits = extra["coarse"]["logits"][0]
    top_ids = extra["coarse"]["top_ids"][0]
    expected = np.argsort(-logits)[:3]
    assert set(top_ids.tolist()) == set(expected.tolist())
    # Final logit equals max of rescored pose logits.
    pose_logits = extra["refiner"]["pose_logits"][0]
    np.testing.assert_allclose(
        out.infos["pose_logit"][0], pose_logits.max(), atol=1e-5
    )


@pytest.mark.slow
def test_multi_detection(setup):
    est, obs, TCO_gt = setup
    boxes = np.concatenate(
        [gt_detection_box(TCO_gt), gt_detection_box(TCO_gt) + 5.0]
    )
    detections = make_detections(["cube", "sphere"], boxes)
    out, extra = est.run_inference_pipeline(obs, detections)
    assert len(out) == 2
    assert list(out.infos["label"]) == ["cube", "sphere"]
    assert np.isfinite(out.poses).all()
    # Coarse depth init from the box is in a sane range.
    z = extra["coarse"]["TCO_init"][:, :, 2, 3]
    assert (z > 0.05).all() and (z < 5.0).all()


@pytest.mark.slow
def test_deterministic(setup):
    est, obs, TCO_gt = setup
    detections = make_detections(["cube"], gt_detection_box(TCO_gt))
    out1, _ = est.run_inference_pipeline(obs, detections)
    out2, _ = est.run_inference_pipeline(obs, detections)
    np.testing.assert_allclose(out1.poses, out2.poses, atol=0)


@pytest.mark.slow
def test_fused_pipeline_matches_phased(setup):
    import dataclasses

    est, obs, TCO_gt = setup
    detections = make_detections(["cube"], gt_detection_box(TCO_gt))
    out_phased, extra_phased = est.run_inference_pipeline(obs, detections)

    est_fused = PoseEstimator(
        est.coarse_model, est.coarse_params, est.refiner_model,
        est.refiner_params, est.mesh_db,
        dataclasses.replace(est.cfg, fused_pipeline=True),
    )
    out_fused, extra_fused = est_fused.run_inference_pipeline(obs, detections)
    np.testing.assert_allclose(
        out_fused.poses, out_phased.poses, atol=1e-4
    )
    np.testing.assert_allclose(
        extra_fused["coarse"]["logits"], extra_phased["coarse"]["logits"],
        atol=2e-4,
    )
    assert "total" in est_fused.timing_


@pytest.mark.slow
def test_hierarchical_prune_keep_all_matches_full(setup):
    """With SO3_prune_keep = probe size, the candidate set is the whole
    grid (Voronoi children partition it), so the pruned coarse stage must
    pick the same best pose as the full sweep."""
    import dataclasses

    est, obs, TCO_gt = setup
    detections = make_detections(["cube"], gt_detection_box(TCO_gt))
    out_full, _ = est.run_inference_pipeline(obs, detections)

    est_pruned = PoseEstimator(
        est.coarse_model, est.coarse_params, est.refiner_model,
        est.refiner_params, est.mesh_db,
        dataclasses.replace(
            est.cfg, SO3_prune_grid_size=4, SO3_prune_keep=4
        ),
    )
    out_pruned, extra = est_pruned.run_inference_pipeline(obs, detections)
    np.testing.assert_allclose(
        out_full.poses, out_pruned.poses, atol=1e-5
    )


@pytest.mark.slow
def test_hierarchical_prune_subset(setup):
    """Pruned mode (keep < probe size): runs, selects finite poses whose
    rotations are members of the full grid."""
    import dataclasses

    from megapose6d_tpu.ops.se3 import geodesic_distance

    est, obs, TCO_gt = setup
    detections = make_detections(["cube"], gt_detection_box(TCO_gt))
    est_pruned = PoseEstimator(
        est.coarse_model, est.coarse_params, est.refiner_model,
        est.refiner_params, est.mesh_db,
        dataclasses.replace(
            est.cfg, SO3_prune_grid_size=4, SO3_prune_keep=2,
            fused_pipeline=True,
        ),
    )
    out, extra = est_pruned.run_inference_pipeline(obs, detections)
    assert np.isfinite(out.poses).all()
    # Coarse inits drawn from the full grid: every top candidate's
    # rotation matches some full-grid rotation exactly (before refining).
    TCO_init = extra["coarse"]["TCO_init"]  # [D, Mc, 4, 4]
    R_init = jnp.asarray(TCO_init[0, :, :3, :3])
    d = np.asarray(
        geodesic_distance(R_init[:, None], est.so3_grid[None])
    )  # [Mc, M]
    # f32 acos is ill-conditioned near 0 distance; 1e-2 rad ~ 0.6 deg.
    assert (d.min(axis=1) < 1e-2).all()


@pytest.mark.slow
def test_rescore_f32_twin_matches_f32_model(setup):
    """InferenceConfig.rescore_f32 rescoring of a bf16 coarse model
    must produce exactly the logits an all-f32 coarse model would
    (same params; dtype only drives activation casts)."""
    import dataclasses

    est, obs, TCO_gt = setup
    coarse_bf16 = PosePredictor(
        dataclasses.replace(est.coarse_model.cfg, compute_dtype="bfloat16")
    )
    cfg16 = dataclasses.replace(est.cfg, rescore_f32=True)
    est16 = PoseEstimator(
        coarse_bf16, est.coarse_params, est.refiner_model,
        est.refiner_params, est.mesh_db, cfg16,
    )
    # Twin was built and computes in f32.
    assert est16.coarse_model_rescore is not coarse_bf16
    assert est16.coarse_model_rescore.cfg.compute_dtype == "float32"

    TCO = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * 2))
    TCO = TCO.at[:, 2, 3].set(0.5)
    idx = jnp.zeros((2,), jnp.int32)
    images = jnp.asarray(obs.images)
    K = jnp.asarray(obs.K)
    logits_twin = est16._rescore(2, est16.coarse_params, images, K, TCO, idx)
    logits_f32 = est._rescore(2, est.coarse_params, images, K, TCO, idx)
    np.testing.assert_allclose(
        np.asarray(logits_twin), np.asarray(logits_f32), atol=1e-6
    )

    # And the full pipeline runs with the flag on a bf16 sweep model.
    det = make_detections(["cube"], gt_detection_box(TCO_gt))
    out, _ = est16.run_inference_pipeline(obs, det)
    assert np.isfinite(out.poses).all()


def test_get_K_resize_projection_consistency():
    """get_K_resize: a point projected through the resized intrinsics
    lands at the half-pixel-rescaled pixel position (the convention of
    jax.image.resize and get_K_crop_resize with a full-image crop)."""
    from megapose6d_tpu.ops.camera import get_K_resize

    K = jnp.asarray(
        [[[130.0, 0, 63.5], [0, 120.0, 47.0], [0, 0, 1.0]]], jnp.float32
    )
    K2 = get_K_resize(K, (48, 64), (24, 32))
    pt = jnp.asarray([[0.03, -0.02, 0.5]])

    def proj(Km):
        uvw = (Km[0] @ pt.T).T
        return uvw[0, :2] / uvw[0, 2]

    uv_full = np.asarray(proj(K))
    uv_half = np.asarray(proj(K2))
    np.testing.assert_allclose(uv_half[0], (uv_full[0] + 0.5) * 0.5 - 0.5,
                               atol=1e-5)
    np.testing.assert_allclose(uv_half[1], (uv_full[1] + 0.5) * 0.5 - 0.5,
                               atol=1e-5)


@pytest.mark.slow
def test_render_at_geometry_matches_full_res(setup):
    """render_at (low-res raster + upsample): the upsampled render must
    geometrically align with the full-resolution render — same silhouette
    placement, small overall L1 gap. A wrong intrinsics rescale would
    shift the object and blow both up."""
    import dataclasses

    est, obs, TCO_gt = setup
    meshes1 = est.mesh_db.select(est.mesh_db.label_to_index(["cube"]))
    imgs = jnp.asarray(obs.images)
    K = jnp.asarray(obs.K)
    T = jnp.asarray(TCO_gt)[None]

    model_lo = PosePredictor(
        dataclasses.replace(est.coarse_model.cfg, render_at=(24, 32))
    )
    out_full = est.coarse_model.apply(
        est.coarse_params, imgs, K, T, meshes1,
        method=PosePredictor.score_views,
    )
    out_lo = model_lo.apply(
        est.coarse_params, imgs, K, T, meshes1,
        method=PosePredictor.score_views,
    )
    r_full = np.asarray(out_full["renders"])
    r_lo = np.asarray(out_lo["renders"])
    assert r_full.shape == r_lo.shape  # CNN input shape unchanged
    sil_full = r_full[..., :3].sum(-1) > 1e-3
    sil_lo = r_lo[..., :3].sum(-1) > 1e-3
    inter = (sil_full & sil_lo).sum()
    union = (sil_full | sil_lo).sum()
    assert union > 0 and inter / union > 0.7, (inter, union)
    assert np.abs(r_full - r_lo).mean() < 0.1


@pytest.mark.slow
def test_coarse_render_size_pipeline(setup):
    """Full pipeline with InferenceConfig.coarse_render_size: runs
    fused + phased, outputs finite, and the sweep twin was built with
    render_at while the rescore model stays full-res."""
    import dataclasses

    est, obs, TCO_gt = setup
    cfg2 = dataclasses.replace(
        est.cfg, coarse_render_size=(24, 32), fused_pipeline=True
    )
    est2 = PoseEstimator(
        est.coarse_model, est.coarse_params, est.refiner_model,
        est.refiner_params, est.mesh_db, cfg2,
    )
    assert est2.coarse_model_sweep.cfg.render_at == (24, 32)
    assert est2.coarse_model_rescore.cfg.render_at is None

    det = make_detections(["cube"], gt_detection_box(TCO_gt))
    out, extra = est2.run_inference_pipeline(obs, det)
    assert np.isfinite(out.poses).all()
    assert np.isfinite(extra["coarse"]["logits"]).all()

    cfg3 = dataclasses.replace(cfg2, fused_pipeline=False)
    est3 = PoseEstimator(
        est.coarse_model, est.coarse_params, est.refiner_model,
        est.refiner_params, est.mesh_db, cfg3,
    )
    out3, _ = est3.run_inference_pipeline(obs, det)
    np.testing.assert_allclose(
        np.asarray(out.poses), np.asarray(out3.poses), atol=1e-5
    )


@pytest.mark.slow
def test_small_native_coarse_model_pipeline(setup):
    """A coarse scorer with a SMALLER native render_size than the
    refiner composes in the estimator (demo_finalize_pipeline
    coarse2_dir A/B; the model's own crop path resizes observations to
    its render_size, so no estimator plumbing is involved). The CNN runs
    ~4x cheaper; this is the flops_split-dominant lever."""
    est, obs, TCO_gt = setup
    small = (24, 32)
    coarse_s = PosePredictor(
        make_coarse_config(render_size=small, face_chunk=32)
    )
    meshes1 = est.mesh_db.select(est.mesh_db.label_to_index(["cube"]))
    cparams_s = coarse_s.init(
        jax.random.PRNGKey(3),
        jnp.zeros((1,) + IMG + (3,), jnp.float32),
        jnp.asarray(obs.K),
        jnp.eye(4, dtype=jnp.float32)[None],
        meshes1,
    )
    est_s = PoseEstimator(
        coarse_s, cparams_s, est.refiner_model, est.refiner_params,
        est.mesh_db, est.cfg,
    )
    det = make_detections(["cube"], gt_detection_box(TCO_gt))
    out, extra = est_s.run_inference_pipeline(obs, det)
    assert out.poses.shape == (1, 4, 4)
    assert np.isfinite(out.poses).all()
    assert np.isfinite(extra["coarse"]["logits"]).all()
    # Refined poses still come from the FULL-res refiner: rotation stays
    # a valid SE(3) member.
    R = out.poses[:, :3, :3]
    np.testing.assert_allclose(
        R @ R.transpose(0, 2, 1), np.eye(3)[None], atol=1e-4
    )
