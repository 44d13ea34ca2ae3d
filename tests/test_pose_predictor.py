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
from megapose6d_tpu.models import (
    PosePredictor,
    make_coarse_config,
    make_refiner_config,
)
from megapose6d_tpu.ops import rasterizer
from megapose6d_tpu.ops.se3 import geodesic_distance

RENDER = (60, 80)  # small for test speed


@pytest.fixture(scope="module")
def mesh_batch():
    objs = RigidObjectDataset(
        [
            RigidObject(label="cube", mesh=make_cube(0.04)),
            RigidObject(label="sphere", mesh=make_uv_sphere(0.035, 8, 12)),
        ]
    )
    db = MeshDataBase.from_object_ds(objs, max_faces=256, n_points=128, n_sym=4)
    return db.batched(align=32)


def scene(mesh_batch, labels=("cube", "sphere")):
    B = len(labels)
    K = jnp.asarray(
        np.tile(
            np.asarray([[120.0, 0, 40], [0, 120.0, 30], [0, 0, 1]], np.float32),
            (B, 1, 1),
        )
    )
    TCO = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (B, 1, 1)))
    TCO = TCO.at[:, 2, 3].set(0.45)
    meshes = mesh_batch.select(mesh_batch.label_to_index(list(labels)))
    # Observation = render of the GT pose.
    out = rasterizer.render_meshes(
        meshes.vertices, meshes.normals, meshes.colors, meshes.faces,
        meshes.face_valid, TCO, K, RENDER, light_ambient=1.0, light_point=0.0,
    )
    return out.rgb, K, TCO, meshes


@pytest.mark.slow
def test_refiner_step_shapes_and_update(mesh_batch):
    cfg = make_refiner_config(
        render_size=RENDER, n_rendered_views=2,
        multiview_type="TCO+front_1view", face_chunk=32,
    )
    model = PosePredictor(cfg)
    images, K, TCO, meshes = scene(mesh_batch)
    params = model.init(jax.random.PRNGKey(0), images, K, TCO, meshes)
    out = model.apply(
        params, images, K, TCO, meshes, method=PosePredictor.refine_step
    )
    assert out["TCO_output"].shape == (2, 4, 4)
    assert out["network_outputs"]["pose"].shape == (2, 9)
    H, W = RENDER
    # 3 obs + 2 views * 6 channels (rgb+normals).
    assert out["images_crop"].shape == (2, H, W, 3)
    assert out["renders"].shape == (2, H, W, 12)
    assert cfg.n_inputs == 15
    # Output pose is a valid SE(3), near the input (small random head).
    R = np.asarray(out["TCO_output"][..., :3, :3])
    np.testing.assert_allclose(
        R @ R.transpose(0, 2, 1), np.tile(np.eye(3), (2, 1, 1)), atol=1e-4
    )
    # Untrained head: update is a valid rotation, magnitude unconstrained.
    ang = np.asarray(
        geodesic_distance(out["TCO_output"][:, :3, :3], TCO[:, :3, :3])
    )
    assert np.isfinite(ang).all()


def test_refiner_renders_nonempty(mesh_batch):
    cfg = make_refiner_config(
        render_size=RENDER, n_rendered_views=2,
        multiview_type="TCO+front_1view", face_chunk=32,
    )
    model = PosePredictor(cfg)
    images, K, TCO, meshes = scene(mesh_batch)
    params = model.init(jax.random.PRNGKey(0), images, K, TCO, meshes)
    out = model.apply(
        params, images, K, TCO, meshes, method=PosePredictor.refine_step
    )
    renders = np.asarray(out["renders"])
    # Both views must show the object (crop centers it).
    assert (renders[:, :, :, :3].max(axis=(1, 2, 3)) > 0.1).all()
    # The cropped observation shows the object too.
    assert (np.asarray(out["images_crop"]).max(axis=(1, 2, 3)) > 0.1).all()


@pytest.mark.slow
def test_coarse_scores(mesh_batch):
    cfg = make_coarse_config(render_size=RENDER, face_chunk=32)
    model = PosePredictor(cfg)
    images, K, TCO, meshes = scene(mesh_batch)
    params = model.init(jax.random.PRNGKey(1), images, K, TCO, meshes)
    out = model.apply(
        params, images, K, TCO, meshes, method=PosePredictor.score_views
    )
    assert out["logits"].shape == (2, 1)
    s = np.asarray(out["scores"])
    assert ((0 < s) & (s < 1)).all()
    assert cfg.n_inputs == 9


@pytest.mark.slow
def test_refine_step_jits_and_scans(mesh_batch):
    """The refiner iteration must compile and run under lax.scan — the
    TPU-native replacement for the reference's Python loop."""
    cfg = make_refiner_config(
        render_size=RENDER, n_rendered_views=1, face_chunk=32,
    )
    model = PosePredictor(cfg)
    images, K, TCO, meshes = scene(mesh_batch)
    params = model.init(jax.random.PRNGKey(0), images, K, TCO, meshes)

    @jax.jit
    def run(params, images, K, TCO, meshes):
        def body(T, _):
            out = model.apply(
                params, images, K, T, meshes,
                method=PosePredictor.refine_step,
            )
            return out["TCO_output"], out["network_outputs"]["pose"]

        return jax.lax.scan(body, TCO, None, length=3)

    T_final, poses = run(params, images, K, TCO, meshes)
    assert T_final.shape == (2, 4, 4)
    assert poses.shape == (3, 2, 9)
    assert np.isfinite(np.asarray(T_final)).all()


@pytest.mark.slow
def test_input_depth_channels(mesh_batch):
    cfg = make_refiner_config(
        render_size=RENDER, n_rendered_views=1, input_depth=True,
        render_depth=True, depth_normalization_type="tCR_scale_clamp_center",
        face_chunk=32,
    )
    model = PosePredictor(cfg)
    rgb, K, TCO, meshes = scene(mesh_batch)
    depth = jnp.full(rgb.shape[:3] + (1,), 0.45, rgb.dtype)
    images = jnp.concatenate([rgb, depth], -1)
    params = model.init(jax.random.PRNGKey(0), images, K, TCO, meshes)
    out = model.apply(
        params, images, K, TCO, meshes, method=PosePredictor.refine_step
    )
    assert out["images_crop"].shape[-1] == 4
    # renders: rgb(3) + normals(3) + depth(1) = 7
    assert out["renders"].shape[-1] == 7
    # Normalized obs depth: 0.45/0.45 - 1 = 0 (clamp-center type).
    d = np.asarray(out["images_crop"][..., 3])
    assert np.abs(d).max() < 0.3


def test_init_render_bypass_params_identical(mesh_batch):
    """skip_render_for_init must produce byte-identical params: it is
    the init fast path (host-CPU init instead of op-by-op over the TPU
    tunnel) used by training.create_train_state on device backends."""
    from megapose6d_tpu.models.pose_predictor import skip_render_for_init

    for cfg in (
        make_refiner_config(render_size=RENDER, face_chunk=32),
        make_coarse_config(render_size=RENDER, face_chunk=32),
    ):
        model = PosePredictor(cfg)
        rgb, K, TCO, meshes = scene(mesh_batch)
        p_real = model.init(jax.random.PRNGKey(3), rgb, K, TCO, meshes)
        with skip_render_for_init():
            p_skip = model.init(jax.random.PRNGKey(3), rgb, K, TCO, meshes)
        assert jax.tree.structure(p_real) == jax.tree.structure(p_skip)
        for a, b in zip(jax.tree.leaves(p_real), jax.tree.leaves(p_skip)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
