"""Detector training CLI (synthetic on-device scenes).

The reference trains its Mask R-CNN with a separate torchvision pipeline
(src/megapose/training/train_detector.py analog in the cosypose lineage);
here the CenterNet-style detector trains on the same on-device synthetic
scene generator used for datagen — no external data needed to bootstrap.

Usage:
    python -m megapose6d_tpu.scripts.run_detector_training \\
        run_id=det n_steps=2000 batch_size=16 [object_dataset=ycbv]
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

from ..meshes.mesh_db import MeshDataBase
from ..models.detector import (
    CenterNetDetector,
    DetectorConfig,
    detection_loss,
    segmentation_loss,
)
from ..scripts.generate_synthetic_dataset import make_scene_renderer
from ..utils.logging import get_logger

logger = get_logger(__name__)


def make_batch_fn(
    mesh_db, batch_size, resolution, n_obj, f=400.0, with_seg=False
):
    render = make_scene_renderer(mesh_db, n_obj, resolution, f)

    def fn(key):
        keys = jax.random.split(key, batch_size)
        rgbs, boxes, classes, valids, segs = [], [], [], [], []
        for k in keys:  # traced loop unrolls; batch_size is small
            rgb, depth, seg, TCO, mesh_idx, _, _visib = render(k)
            rgbs.append(rgb)
            if with_seg:
                # Scene seg ids (1..n_obj) -> class ids (-1 = background),
                # the mask-head target (MaskRCNN training-data analog).
                cls_map = jnp.where(
                    seg > 0, mesh_idx[jnp.maximum(seg - 1, 0)], -1
                )
                segs.append(cls_map.astype(jnp.int32))
            # Boxes from per-object projected masks: use seg extents.
            obj_boxes, obj_valid = [], []
            for n in range(n_obj):
                m = seg == n + 1
                any_hit = m.any()
                ys = jnp.where(
                    m.any(axis=1), jnp.arange(m.shape[0]), m.shape[0]
                )
                xs = jnp.where(
                    m.any(axis=0), jnp.arange(m.shape[1]), m.shape[1]
                )
                y1 = jnp.min(ys)
                x1 = jnp.min(xs)
                ys2 = jnp.where(m.any(axis=1), jnp.arange(m.shape[0]), -1)
                xs2 = jnp.where(m.any(axis=0), jnp.arange(m.shape[1]), -1)
                y2 = jnp.max(ys2) + 1
                x2 = jnp.max(xs2) + 1
                obj_boxes.append(
                    jnp.stack([x1, y1, x2, y2]).astype(jnp.float32)
                )
                obj_valid.append(any_hit)
            boxes.append(jnp.stack(obj_boxes))
            classes.append(mesh_idx)
            valids.append(jnp.stack(obj_valid))
        out = (
            jnp.stack(rgbs),
            jnp.stack(boxes),
            jnp.stack(classes),
            jnp.stack(valids),
        )
        if with_seg:
            out = out + (jnp.stack(segs),)
        return out

    return jax.jit(fn)


def main(argv=None):
    args = dict(
        run_id="detector", run_dir="runs", n_steps="1000", batch_size="8",
        resolution="240,320", n_obj_per_scene="2", lr="1e-3", width="32",
        object_dataset="", log_every="50", seed="0", predict_masks="0",
        demo_world="0", n_eval="0",
        # Segmented long runs (VERDICT r3 #5): wall-clock bound per
        # segment + periodic checkpoints; re-running the same CLI
        # resumes from the latest checkpoint (like demo_long_refiner).
        max_seconds="1e9", ckpt_every="1000",
    )
    for a in sys.argv[1:] if argv is None else argv:
        k, _, v = a.partition("=")
        assert k in args, f"unknown arg {k}"
        args[k] = v

    if args["demo_world"] == "1":
        # The textured demo world (same assets/appearance as the pose
        # demo checkpoints + demo_ar_baseline scenes).
        from .demo_ar_baseline import build_bop_world

        _, objects = build_bop_world()
    elif args["object_dataset"]:
        from ..data.datasets_cfg import make_object_dataset

        objects = make_object_dataset(args["object_dataset"])
    else:
        from ..meshes.io import make_cube, make_uv_sphere
        from ..meshes.mesh_db import RigidObject, RigidObjectDataset

        objects = RigidObjectDataset(
            [
                RigidObject(label="cube", mesh=make_cube(0.04)),
                RigidObject(label="sphere", mesh=make_uv_sphere(0.04)),
            ]
        )
    mesh_db = MeshDataBase.from_object_ds(objects).batched()
    resolution = tuple(int(x) for x in args["resolution"].split(","))
    n_obj = int(args["n_obj_per_scene"])
    batch_size = int(args["batch_size"])

    predict_masks = bool(int(args["predict_masks"]))
    cfg = DetectorConfig(
        n_classes=mesh_db.n_labels, width=int(args["width"]),
        predict_masks=predict_masks,
    )
    model = CenterNetDetector(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1,) + resolution + (3,), jnp.float32),
    )
    n_steps = int(args["n_steps"])
    # Warmup + cosine decay (constant LR stalls CenterNet heatmap
    # training past ~1-2k steps; reference trains its detector with a
    # multi-step decay schedule).
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=float(args["lr"]),
        warmup_steps=min(500, max(1, n_steps // 10)),
        decay_steps=max(n_steps, 2),
        end_value=float(args["lr"]) * 0.01,
    )
    tx = optax.adam(sched)
    opt_state = tx.init(params)
    batch_fn = make_batch_fn(  # already jitted (one XLA program)
        mesh_db, batch_size, resolution, n_obj, with_seg=predict_masks
    )

    @jax.jit
    def step(params, opt_state, rgbs, boxes, classes, valids, seg=None):
        def loss_fn(p):
            out = model.apply(p, rgbs)
            loss, aux = detection_loss(
                out, boxes, classes, valids, cfg.stride
            )
            if seg is not None:
                seg_l = segmentation_loss(out, seg, cfg.stride)
                loss = loss + seg_l
                aux = dict(aux, det_seg_loss=seg_l)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    run_dir = Path(args["run_dir"]) / args["run_id"]
    run_dir.mkdir(parents=True, exist_ok=True)
    (run_dir / "labels.json").write_text(json.dumps(list(mesh_db.labels)))
    # Persist the model config so eval can rebuild the detector
    # (load_detector in evaluation/evaluation.py).
    (run_dir / "config.json").write_text(
        json.dumps(dataclasses.asdict(cfg), indent=2)
    )

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckpt_dir = (run_dir / "checkpoints").absolute()
    start_step = 0
    latest = ckpt_dir / "latest.txt"
    if latest.exists():
        start_step = int(latest.read_text().strip())
        restored = ckptr.restore(
            ckpt_dir / f"step_{start_step}",
            {"params": params, "opt_state": opt_state},
        )
        params, opt_state = restored["params"], restored["opt_state"]
        logger.info(f"resumed from step {start_step}")

    def save_ckpt(step):
        ckptr.save(
            ckpt_dir / f"step_{step}",
            {"params": params, "opt_state": opt_state}, force=True,
        )
        ckptr.wait_until_finished()
        latest.write_text(str(step))

    ckpt_every = int(args["ckpt_every"])
    max_seconds = float(args["max_seconds"])
    key = jax.random.fold_in(
        jax.random.PRNGKey(int(args["seed"])), start_step
    )
    t0 = time.monotonic()
    # `done` counts COMPLETED steps: the time check runs AFTER each step,
    # so a timed-out segment checkpoints the step it actually trained
    # (saving i+1 on a pre-step break mislabels the checkpoint and makes
    # resume silently skip a step — ADVICE r4).
    done = start_step
    for i in range(start_step, n_steps):
        key, sub = jax.random.split(key)
        batch = batch_fn(sub)
        rgbs, boxes, classes, valids = batch[:4]
        seg = batch[4] if predict_masks else None
        params, opt_state, loss, aux = step(
            params, opt_state, rgbs, boxes, classes, valids, seg
        )
        done = i + 1
        if done % int(args["log_every"]) == 0:
            log = {
                "step": done,
                "loss": float(loss),
                **{k: float(v) for k, v in aux.items()},
                "time": time.monotonic() - t0,
            }
            logger.info(str(log))
            with open(run_dir / "log.txt", "a") as fh:
                fh.write(json.dumps(log) + "\n")
        if done % ckpt_every == 0:
            save_ckpt(done)
        if time.monotonic() - t0 > max_seconds:
            break

    if done > start_step and (
        not latest.exists() or int(latest.read_text().strip()) != done
    ):
        save_ckpt(done)
    # Keep the historical "final" name for eval loaders.
    ckptr.save(
        (run_dir / "checkpoints" / "final").absolute(), {"params": params},
        force=True,
    )
    ckptr.wait_until_finished()
    logger.info(f"saved detector to {run_dir}")

    n_eval = int(args["n_eval"])
    if n_eval:
        rep = evaluate_detector(
            model, params, cfg, batch_fn, n_eval, predict_masks,
            seed=int(args["seed"]) + 777,
        )
        (run_dir / "eval.json").write_text(json.dumps(rep, indent=2))
        logger.info(f"detector eval: {json.dumps(rep)}")


def evaluate_detector(
    model, params, cfg, batch_fn, n_batches, predict_masks, seed=777
):
    """Held-out metrics: mean box IoU of matched detections, class
    accuracy, recall at score>0.3, and (if the mask head is on) mean
    per-instance mask IoU — the MaskRCNN-replacement scorecard
    (reference detector role: inference/detector.py:64-139)."""
    import numpy as np

    from ..models.detector import decode_detections

    ious, cls_ok, found, mask_ious = [], [], [], []
    key = jax.random.PRNGKey(seed)
    for _ in range(n_batches):
        key, sub = jax.random.split(key)
        batch = batch_fn(sub)
        rgbs, gt_boxes, gt_classes, gt_valids = [
            np.asarray(x) for x in batch[:4]
        ]
        seg = np.asarray(batch[4]) if predict_masks else None
        out = model.apply(params, jnp.asarray(rgbs))
        dec = decode_detections(out, cfg.stride, top_k=8)
        boxes = np.asarray(dec["boxes"])
        scores = np.asarray(dec["scores"])
        classes = np.asarray(dec["classes"])
        seg_pred = np.asarray(out["seg"]) if predict_masks else None
        B = rgbs.shape[0]
        for b in range(B):
            keep = scores[b] > 0.3
            for g in range(gt_boxes.shape[1]):
                if not gt_valids[b, g]:
                    continue
                gx1, gy1, gx2, gy2 = gt_boxes[b, g]
                best_iou, best_j = 0.0, -1
                for j in np.nonzero(keep)[0]:
                    x1, y1, x2, y2 = boxes[b, j]
                    ix = max(
                        0.0, min(x2, gx2) - max(x1, gx1)
                    )
                    iy = max(0.0, min(y2, gy2) - max(y1, gy1))
                    inter = ix * iy
                    union = (
                        (x2 - x1) * (y2 - y1)
                        + (gx2 - gx1) * (gy2 - gy1)
                        - inter
                    )
                    iou = inter / union if union > 0 else 0.0
                    if iou > best_iou:
                        best_iou, best_j = iou, j
                found.append(float(best_iou > 0.5))
                if best_j >= 0:
                    ious.append(best_iou)
                    cls_ok.append(
                        float(classes[b, best_j] == gt_classes[b, g])
                    )
                    if seg_pred is not None and seg is not None:
                        c = int(gt_classes[b, g])
                        s = cfg.stride
                        pm = seg_pred[b, :, :, c] > 0
                        gm = seg[b][::s, ::s] == c
                        mh = min(pm.shape[0], gm.shape[0])
                        mw = min(pm.shape[1], gm.shape[1])
                        pm, gm = pm[:mh, :mw], gm[:mh, :mw]
                        u = (pm | gm).sum()
                        if u:
                            mask_ious.append(float((pm & gm).sum() / u))
    rep = {
        "n_gt": len(found),
        "recall@iou0.5": float(np.mean(found)) if found else 0.0,
        "mean_iou_matched": float(np.mean(ious)) if ious else 0.0,
        "class_accuracy": float(np.mean(cls_ok)) if cls_ok else 0.0,
    }
    if mask_ious:
        rep["mean_mask_iou"] = float(np.mean(mask_ious))
    return rep


if __name__ == "__main__":
    main()
