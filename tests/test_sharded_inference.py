"""Multi-chip inference: hypothesis axis sharded over an 8-device mesh."""

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
)
from megapose6d_tpu.models import (
    PosePredictor,
    make_coarse_config,
    make_refiner_config,
)
from megapose6d_tpu.ops import rasterizer
from megapose6d_tpu.parallel import make_mesh

IMG = (72, 96)
K = np.asarray([[120.0, 0, 48], [0, 120.0, 36], [0, 0, 1]], np.float32)


@pytest.mark.slow
def test_sharded_coarse_matches_single_device():
    assert len(jax.devices()) == 8
    objs = RigidObjectDataset([RigidObject(label="cube", mesh=make_cube(0.04))])
    mesh_db = MeshDataBase.from_object_ds(
        objs, max_faces=64, n_points=64, n_sym=2
    ).batched(align=32)

    coarse = PosePredictor(
        make_coarse_config(render_size=(48, 64), face_chunk=32)
    )
    refiner = PosePredictor(
        make_refiner_config(
            render_size=(48, 64), n_rendered_views=1,
            multiview_type="TCO+front_1view", face_chunk=32,
        )
    )
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 0.5
    m1 = mesh_db.select(jnp.zeros((1,), jnp.int32))
    out = rasterizer.render_meshes(
        m1.vertices, m1.normals, m1.colors, m1.faces, m1.face_valid,
        jnp.asarray(T)[None], jnp.asarray(K)[None], IMG,
        light_ambient=1.0, light_point=0.0,
    )
    obs = ObservationTensor(images=np.asarray(out.rgb), K=K[None])
    cparams = coarse.init(
        jax.random.PRNGKey(0), jnp.asarray(obs.images), jnp.asarray(obs.K),
        jnp.asarray(T)[None], m1,
    )
    rparams = refiner.init(
        jax.random.PRNGKey(1), jnp.asarray(obs.images), jnp.asarray(obs.K),
        jnp.asarray(T)[None], m1,
    )
    cfg = InferenceConfig(
        SO3_grid_size=16, n_refiner_iterations=1, n_pose_hypotheses=2,
        bsz_images=2, bsz_objects=2, max_detections=1,
    )
    det = make_detections(["cube"], np.asarray([[30.0, 20, 70, 55]]))

    est_single = PoseEstimator(
        coarse, cparams, refiner, rparams, mesh_db, cfg
    )
    out_single, extra_single = est_single.run_inference_pipeline(obs, det)

    mesh = make_mesh(8)
    est_sharded = PoseEstimator(
        coarse, cparams, refiner, rparams, mesh_db, cfg, device_mesh=mesh
    )
    out_sharded, extra_sharded = est_sharded.run_inference_pipeline(obs, det)

    np.testing.assert_allclose(
        extra_sharded["coarse"]["logits"],
        extra_single["coarse"]["logits"],
        atol=2e-4,
    )
    np.testing.assert_allclose(
        out_sharded.poses, out_single.poses, atol=1e-4
    )


@pytest.mark.slow
def test_sharded_pruned_matches_single_device():
    """Hierarchical coarse pruning over the device mesh: logits and final
    poses must match the single-device pruned pipeline."""
    import dataclasses

    assert len(jax.devices()) == 8
    objs = RigidObjectDataset([RigidObject(label="cube", mesh=make_cube(0.04))])
    mesh_db = MeshDataBase.from_object_ds(
        objs, max_faces=64, n_points=64, n_sym=2
    ).batched(align=32)
    coarse = PosePredictor(
        make_coarse_config(render_size=(48, 64), face_chunk=32)
    )
    refiner = PosePredictor(
        make_refiner_config(
            render_size=(48, 64), n_rendered_views=1,
            multiview_type="TCO+front_1view", face_chunk=32,
        )
    )
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 0.5
    m1 = mesh_db.select(jnp.zeros((1,), jnp.int32))
    out = rasterizer.render_meshes(
        m1.vertices, m1.normals, m1.colors, m1.faces, m1.face_valid,
        jnp.asarray(T)[None], jnp.asarray(K)[None], IMG,
        light_ambient=1.0, light_point=0.0,
    )
    obs = ObservationTensor(images=np.asarray(out.rgb), K=K[None])
    cparams = coarse.init(
        jax.random.PRNGKey(0), jnp.asarray(obs.images), jnp.asarray(obs.K),
        jnp.asarray(T)[None], m1,
    )
    rparams = refiner.init(
        jax.random.PRNGKey(1), jnp.asarray(obs.images), jnp.asarray(obs.K),
        jnp.asarray(T)[None], m1,
    )
    cfg = InferenceConfig(
        SO3_grid_size=16, SO3_prune_grid_size=4, SO3_prune_keep=2,
        n_refiner_iterations=1, n_pose_hypotheses=2,
        bsz_images=2, bsz_objects=2, max_detections=1,
    )
    det = make_detections(["cube"], np.asarray([[30.0, 20, 70, 55]]))

    est_single = PoseEstimator(coarse, cparams, refiner, rparams, mesh_db, cfg)
    out_single, extra_single = est_single.run_inference_pipeline(obs, det)

    est_sharded = PoseEstimator(
        coarse, cparams, refiner, rparams, mesh_db, cfg,
        device_mesh=make_mesh(8),
    )
    out_sharded, extra_sharded = est_sharded.run_inference_pipeline(obs, det)

    # -inf padded slots compare equal; finite slots to tolerance.
    ls, lp = (
        np.asarray(extra_sharded["coarse"]["logits"]),
        np.asarray(extra_single["coarse"]["logits"]),
    )
    assert ls.shape == lp.shape
    np.testing.assert_array_equal(np.isinf(ls), np.isinf(lp))
    f = np.isfinite(lp)
    np.testing.assert_allclose(ls[f], lp[f], atol=2e-4)
    np.testing.assert_allclose(out_sharded.poses, out_single.poses, atol=1e-4)
