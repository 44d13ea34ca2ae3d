import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from megapose6d_tpu.ops import losses, se3


def rand_T(rng, b):
    R = Rotation.random(b, random_state=rng).as_matrix().astype(np.float32)
    t = rng.randn(b, 3).astype(np.float32) * 0.1 + np.asarray([0, 0, 1.0])
    return np.asarray(se3.make_se3(jnp.asarray(R), jnp.asarray(t)))


def test_loss_CO_symmetric_zero_at_gt(rng):
    T = jnp.asarray(rand_T(rng, 4))
    pts = jnp.asarray(rng.randn(4, 20, 3).astype(np.float32) * 0.05)
    gt_set = T[:, None]  # single symmetry
    loss, assign = losses.loss_CO_symmetric(gt_set, T, pts)
    np.testing.assert_allclose(loss, 0.0, atol=1e-6)
    np.testing.assert_allclose(assign, T, atol=1e-6)


def test_loss_CO_symmetric_picks_min(rng):
    T = jnp.asarray(rand_T(rng, 3))
    far = jnp.asarray(rand_T(rng, 3)).at[:, 0, 3].add(10.0)
    pts = jnp.asarray(rng.randn(3, 20, 3).astype(np.float32) * 0.05)
    gt_set = jnp.stack([far, T], axis=1)
    loss, assign = losses.loss_CO_symmetric(gt_set, T, pts)
    np.testing.assert_allclose(loss, 0.0, atol=1e-6)
    np.testing.assert_allclose(assign, T, atol=1e-6)
    # Padded symmetry slots must be ignored.
    sym_valid = jnp.asarray([[True, False]] * 3)
    loss2, assign2 = losses.loss_CO_symmetric(
        gt_set, T, pts, sym_valid=sym_valid
    )
    assert (np.asarray(loss2) > 1.0).all()
    np.testing.assert_allclose(assign2, far, atol=1e-5)


def test_disentangled_loss_zero_at_exact_deltas(rng):
    """Feeding the network outputs that encode the exact GT update must give
    (near-)zero loss — validates the full vxvy/vz/dR algebra chain."""
    B = 5
    TCO_input = jnp.asarray(rand_T(rng, B))
    TCO_gt = jnp.asarray(rand_T(rng, B))
    K = jnp.asarray(
        np.tile(
            np.asarray([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]], np.float32),
            (B, 1, 1),
        )
    )
    pts = jnp.asarray(rng.randn(B, 30, 3).astype(np.float32) * 0.05)
    tCR = TCO_input[:, :3, 3]  # reference point at object origin

    dR_gt = TCO_gt[:, :3, :3] @ jnp.swapaxes(TCO_input[:, :3, :3], -2, -1)
    tCR_out_gt = TCO_gt[:, :3, 3] - jnp.einsum(
        "bij,bj->bi", dR_gt, TCO_input[:, :3, 3] - tCR
    )
    fxfy = jnp.stack([K[:, 0, 0], K[:, 1, 1]], -1)
    vz_gt = tCR_out_gt[:, 2:3] / tCR[:, 2:3]
    vxvy_gt = fxfy * (
        tCR_out_gt[:, :2] / tCR_out_gt[:, 2:3] - tCR[:, :2] / tCR[:, 2:3]
    )
    ortho6d = jnp.concatenate([dR_gt[..., :, 0], dR_gt[..., :, 1]], -1)
    outputs = jnp.concatenate([ortho6d, vxvy_gt, vz_gt], -1)

    loss, parts = losses.loss_refiner_CO_disentangled_reference_point(
        TCO_gt[:, None], TCO_input, outputs, K, pts, tCR
    )
    np.testing.assert_allclose(loss, 0.0, atol=1e-4)


def test_add_losses(rng):
    T = jnp.asarray(rand_T(rng, 2))
    pts = jnp.asarray(rng.randn(2, 15, 3).astype(np.float32) * 0.05)
    np.testing.assert_allclose(
        losses.compute_ADD_L1_loss(T, T, pts), 0.0, atol=1e-7
    )
    d = losses.dists_add_symmetric(T, T, pts)
    np.testing.assert_allclose(d, 0.0, atol=1e-7)
    # Symmetric distance <= plain ADD distance.
    # Nearest neighbor minimizes the L2 displacement, so per-point
    # ||d_sym||_2 <= ||d_add||_2 (not true in L1).
    T2 = T.at[:, 0, 3].add(0.02)
    d_add = np.linalg.norm(np.asarray(losses.dists_add(T2, T, pts)), axis=-1)
    d_sym = np.linalg.norm(
        np.asarray(losses.dists_add_symmetric(T2, T, pts)), axis=-1
    )
    assert (d_sym <= d_add + 1e-5).all()
