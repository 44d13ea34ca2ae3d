import jax.numpy as jnp
import numpy as np

from megapose6d_tpu.ops import cropping


def test_crop_identity(rng):
    img = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
    boxes = jnp.asarray([[0.0, 0.0, 24.0, 16.0]] * 2)
    out = cropping.crop_images(img, boxes, (16, 24))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_crop_upsample_constant(rng):
    img = jnp.ones((1, 8, 8, 3), jnp.float32) * 0.7
    boxes = jnp.asarray([[2.0, 2.0, 6.0, 6.0]])
    out = cropping.crop_images(img, boxes, (16, 16))
    np.testing.assert_allclose(out, 0.7, atol=1e-6)


def test_crop_depth_masking():
    img = jnp.ones((1, 8, 8, 4), jnp.float32)
    img = img.at[0, :, :4, 3].set(0.0)  # left half depth invalid
    boxes = jnp.asarray([[0.0, 0.0, 8.0, 8.0]])
    out = np.asarray(cropping.crop_images(img, boxes, (8, 8), depth_dim=3))
    assert (out[0, :, :4, 3] == 0).all()
    assert (out[0, :, 5:, 3] == 1).all()
    # RGB channels untouched by masking.
    assert (out[0, ..., :3] == 1).all()


def test_deepim_boxes_aspect_and_containment():
    center = jnp.asarray([[100.0, 80.0]])
    obs = jnp.asarray([[80.0, 60.0, 120.0, 100.0]])
    rend = jnp.asarray([[90.0, 70.0, 140.0, 95.0]])
    box = np.asarray(
        cropping.deepim_boxes(center, obs, rend, lamb=1.4, im_size=(240, 320))
    )[0]
    w = box[2] - box[0]
    h = box[3] - box[1]
    np.testing.assert_allclose(w / h, 320 / 240, atol=1e-5)
    # Both boxes contained (margin 1.4 > 1).
    assert box[0] <= 80 and box[1] <= 60 and box[2] >= 140 and box[3] >= 100
    # Centered at the reference center.
    np.testing.assert_allclose((box[0] + box[2]) / 2, 100.0, atol=1e-4)
    np.testing.assert_allclose((box[1] + box[3]) / 2, 80.0, atol=1e-4)
