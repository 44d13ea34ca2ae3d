import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from megapose6d_tpu.data import ObservationTensor
from megapose6d_tpu.models.detector import (
    CenterNetDetector,
    Detector,
    DetectorConfig,
    decode_detections,
    detection_loss,
)

H, W = 64, 96


@pytest.fixture(scope="module")
def det_setup():
    cfg = DetectorConfig(n_classes=2, width=16, stride=4, max_detections=8)
    model = CenterNetDetector(cfg)
    imgs = jnp.zeros((1, H, W, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs)
    return cfg, model, params


def test_forward_shapes(det_setup):
    cfg, model, params = det_setup
    out = model.apply(params, jnp.zeros((2, H, W, 3)))
    assert out["heatmap"].shape == (2, H // 4, W // 4, 2)
    assert out["wh"].shape == (2, H // 4, W // 4, 2)
    assert (np.asarray(out["wh"]) >= 0).all()  # softplus sizes


def test_decode_peaks():
    # Hand-built outputs: one hot peak per class.
    h, w, C, stride = 16, 24, 2, 4
    heat = np.full((1, h, w, C), -10.0, np.float32)
    heat[0, 5, 8, 0] = 6.0  # strong class-0 peak
    heat[0, 10, 15, 1] = 4.0
    wh = np.zeros((1, h, w, 2), np.float32)
    wh[0, 5, 8] = [4.0, 3.0]
    wh[0, 10, 15] = [2.0, 2.0]
    off = np.zeros((1, h, w, 2), np.float32)
    out = decode_detections(
        {"heatmap": jnp.asarray(heat), "wh": jnp.asarray(wh),
         "offset": jnp.asarray(off)},
        stride, 4,
    )
    boxes = np.asarray(out["boxes"][0])
    scores = np.asarray(out["scores"][0])
    classes = np.asarray(out["classes"][0])
    assert scores[0] > scores[1] > scores[2]
    assert classes[0] == 0 and classes[1] == 1
    # Box 0 centered at (8*4, 5*4) with size (16, 12).
    np.testing.assert_allclose(
        boxes[0], [32 - 8, 20 - 6, 32 + 8, 20 + 6], atol=1e-4
    )


@pytest.mark.slow
def test_detection_loss_decreases(det_setup):
    cfg, model, params = det_setup
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32))
    gt_boxes = jnp.asarray(
        [[[20.0, 16, 44, 40], [60, 20, 80, 44]]] * 2
    )
    gt_classes = jnp.asarray([[0, 1]] * 2, jnp.int32)
    gt_valid = jnp.ones((2, 2), bool)

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply(p, imgs)
            return detection_loss(
                out, gt_boxes, gt_classes, gt_valid, cfg.stride
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    p = params
    losses = []
    for _ in range(12):
        p, opt_state, loss = step(p, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_detector_wrapper_contract(det_setup):
    cfg, model, params = det_setup
    det = Detector(
        model, params, labels=["obj_a", "obj_b"], detection_th=0.0,
        one_instance_per_class=True,
    )
    obs = ObservationTensor(
        images=np.random.rand(1, H, W, 3).astype(np.float32),
        K=np.eye(3, dtype=np.float32)[None] * 100,
    )
    detections = det.get_detections(obs)
    # one_instance_per_class with 2 classes -> at most 2 detections.
    assert len(detections) <= 2
    assert set(detections.infos.columns) >= {
        "label", "score", "batch_im_id", "instance_id",
    }
    assert detections.bboxes.shape[1] == 4
    for label in detections.infos["label"]:
        assert label in ("obj_a", "obj_b")
    # Threshold filtering works.
    none = det.get_detections(obs, detection_th=1.1)
    assert len(none) == 0


@pytest.mark.slow
def test_mask_head_trains_and_emits_masks():
    """Segmentation head (MaskRCNN mask capability,
    models/mask_rcnn.py:24-45): BCE seg loss decreases and the Detector
    wrapper emits per-instance masks restricted to the detection box."""
    import optax
    from megapose6d_tpu.models.detector import segmentation_loss

    cfg = DetectorConfig(
        n_classes=2, width=16, stride=4, max_detections=4,
        predict_masks=True,
    )
    model = CenterNetDetector(cfg)
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(params, imgs)
    assert out["seg"].shape == (2, H // 4, W // 4, 2)

    # GT: class 0 square top-left, class 1 square bottom-right.
    gt_seg = np.full((2, H, W), -1, np.int32)
    gt_seg[:, 8:32, 8:40] = 0
    gt_seg[:, 40:60, 56:88] = 1
    gt_boxes = jnp.asarray([[[8.0, 8, 40, 32], [56, 40, 88, 60]]] * 2)
    gt_classes = jnp.asarray([[0, 1]] * 2, jnp.int32)
    gt_valid = jnp.ones((2, 2), bool)

    tx = optax.adam(2e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            o = model.apply(p, imgs)
            det, _ = detection_loss(
                o, gt_boxes, gt_classes, gt_valid, cfg.stride
            )
            seg = segmentation_loss(o, jnp.asarray(gt_seg), cfg.stride)
            return det + seg, seg

        (loss, seg_l), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, seg_l

    p = params
    seg_losses = []
    for _ in range(30):
        p, opt_state, seg_l = step(p, opt_state)
        seg_losses.append(float(seg_l))
    assert seg_losses[-1] < seg_losses[0] * 0.8, seg_losses[:3] + seg_losses[-3:]

    det = Detector(model, p, labels=["a", "b"], detection_th=0.0)
    obs = ObservationTensor(
        images=np.asarray(imgs[:1]), K=np.eye(3, dtype=np.float32)[None] * 100
    )
    detections = det.get_detections(obs)
    assert "masks" in detections.tensors
    masks = detections.masks
    assert masks.shape[1:] == (H, W) and masks.dtype == bool
    # Masks restricted to their boxes.
    for i in range(len(detections)):
        x0, y0, x1, y1 = np.asarray(detections.bboxes[i])
        m = np.asarray(masks[i])
        ys, xs = np.nonzero(m)
        if len(ys):
            assert xs.min() >= x0 - 1 and xs.max() <= x1 + 1
            assert ys.min() >= y0 - 1 and ys.max() <= y1 + 1
