"""End-to-end system demo: train coarse + refiner on synthetic scenes,
then measure pose accuracy of the full inference pipeline.

This is the framework's self-contained proof of life (the reference's
analog is the debug/overfit configs + the barbecue-sauce golden example,
SURVEY.md §4): everything — data generation, rendering, training,
hypothesis scoring, refinement, metrics — runs on-device.

Writes `<out_dir>/report.json` with ADD / rotation / translation errors of
(a) the noised initial poses, (b) the refiner applied to them, and
(c) the full coarse->refine pipeline from GT boxes.

Usage:
    python -m megapose6d_tpu.scripts.demo_synthetic_e2e out_dir=demo \\
        n_steps=600 [batch_size=16] [render=120,160] [input=240,320]
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data import ObservationTensor
from ..inference import InferenceConfig, PoseEstimator, make_detections
from ..meshes.io import make_cube, make_uv_sphere
from ..meshes.mesh_db import MeshDataBase, RigidObject, RigidObjectDataset
from ..models.pose_predictor import PosePredictor, PosePredictorConfig
from ..ops.se3 import add_pose_noise, geodesic_distance
from ..training.config import TrainingConfig, make_coarse_cfg, make_refiner_cfg
from ..training.train import create_train_state, make_train_step, synthetic_batch_fn
from ..utils.logging import get_logger

logger = get_logger(__name__)


def _position_colored(mesh):
    """Color vertices by normalized position: breaks every rotational
    symmetry so the pose is identifiable from appearance."""
    import dataclasses as _dc

    v = mesh.vertices
    lo, hi = v.min(0), v.max(0)
    colors = ((v - lo) / np.maximum(hi - lo, 1e-9)).astype(np.float32)
    return _dc.replace(mesh, vertex_colors=0.15 + 0.85 * colors)


def build_world(
    max_faces=2048, return_objects=False, labels=("cube", "sphere")
):
    """Two random-block-TEXTURED primitives (exercises the per-pixel texture
    path end-to-end). Texture, not smooth vertex color, is what makes
    rotation refinable at demo training scale: the high-frequency pattern
    gives the render-and-compare CNN sharp orientation cues, like the real
    textured BOP/GSO assets the reference trains on. max_faces=2048 keeps
    the sphere below the decimation threshold (decimation is UV-destroying).

    `labels` renames the two objects (demo_ar_baseline uses BOP-convention
    obj_NNNNNN labels so CSV obj_id semantics hold); geometry/appearance —
    and therefore checkpoint compatibility — are identical."""
    objs = RigidObjectDataset(
        [
            RigidObject(
                label=labels[0], mesh=make_cube(0.045, textured=True, seed=0)
            ),
            RigidObject(
                label=labels[1],
                mesh=make_uv_sphere(0.04, 24, 32, textured=True, seed=1),
            ),
        ]
    )
    db = MeshDataBase.from_object_ds(
        objs, max_faces=max_faces, n_points=512, n_sym=4
    ).batched()
    return (db, objs) if return_objects else db


def train_model(cfg: TrainingConfig, mesh_db, n_steps: int, input_res, tag: str):
    model = PosePredictor(PosePredictorConfig(**cfg.model_config_kwargs()))
    state = create_train_state(
        cfg, model, mesh_db, jax.random.PRNGKey(cfg.seed), input_res=input_res
    )
    step_fn = make_train_step(model, cfg, mesh_db)
    batch_fn = jax.jit(
        synthetic_batch_fn(mesh_db, cfg.batch_size, input_res, f=400.0)
    )
    key = jax.random.PRNGKey(cfg.seed + 1)
    t0 = time.monotonic()
    losses = []
    for i in range(n_steps):
        key, k1, k2 = jax.random.split(key, 3)
        batch = batch_fn(k1)
        state, metrics = step_fn(state, batch, k2, cfg.n_iterations)
        if (i + 1) % 50 == 0 or i == 0:
            loss = float(metrics["loss_total"])
            losses.append(loss)
            logger.info(
                f"[{tag}] step {i + 1}/{n_steps} loss={loss:.4f} "
                f"({(time.monotonic() - t0) / (i + 1):.2f}s/step)"
            )
    return model, state, losses


def pose_errors(TCO_pred, TCO_gt, points):
    from ..ops.se3 import transform_pts

    pred = transform_pts(jnp.asarray(TCO_pred), points)
    gt = transform_pts(jnp.asarray(TCO_gt), points)
    add = jnp.linalg.norm(pred - gt, axis=-1).mean(-1)
    rot = jnp.degrees(
        geodesic_distance(
            jnp.asarray(TCO_pred)[:, :3, :3], jnp.asarray(TCO_gt)[:, :3, :3]
        )
    )
    trans = jnp.linalg.norm(
        jnp.asarray(TCO_pred)[:, :3, 3] - jnp.asarray(TCO_gt)[:, :3, 3],
        axis=-1,
    )
    return np.asarray(add), np.asarray(rot), np.asarray(trans)


def main(argv=None):
    args = dict(
        out_dir="demo_e2e", n_steps="600", coarse_steps="400",
        batch_size="16", render="120,160", input="240,320",
        n_eval="16", refine_iters="3", so3="128", seed="0",
    )
    for a in sys.argv[1:] if argv is None else argv:
        k, _, v = a.partition("=")
        assert k in args, f"unknown arg {k}"
        args[k] = v

    out_dir = Path(args["out_dir"])
    out_dir.mkdir(parents=True, exist_ok=True)
    render = tuple(int(x) for x in args["render"].split(","))
    input_res = tuple(int(x) for x in args["input"].split(","))
    dtype = "bfloat16" if jax.devices()[0].platform != "cpu" else "float32"

    mesh_db = build_world()
    logger.info(f"world: {mesh_db.labels}; device {jax.devices()[0]}")

    base = TrainingConfig(
        input_resize=input_res,
        render_size=render,
        batch_size=int(args["batch_size"]),
        # Spatial-pool head: GAP backbones cannot learn rotation at demo
        # data scale (see demo_long_refiner docstring + DEMO.md).
        backbone_str="resnet18-spatial",
        compute_dtype=dtype,
        n_points_loss=256,
        lr=3e-4,
        n_epochs_warmup=1,
        lr_epoch_decay=10**6,
        epoch_size=int(args["batch_size"]),
        seed=int(args["seed"]),
    )
    ref_cfg = dataclasses.replace(
        make_refiner_cfg(base), n_rendered_views=2,
        multiview_type="front_1view", n_iterations=1,
    )
    refiner, ref_state, ref_losses = train_model(
        ref_cfg, mesh_db, int(args["n_steps"]), input_res, "refiner"
    )
    coarse_cfg = dataclasses.replace(make_coarse_cfg(base), n_hypotheses=4)
    coarse, coarse_state, coarse_losses = train_model(
        coarse_cfg, mesh_db, int(args["coarse_steps"]), input_res, "coarse"
    )

    # ------------------------------------------------------------------
    # Evaluation on held-out synthetic scenes.
    # ------------------------------------------------------------------
    n_eval = int(args["n_eval"])
    eval_batch = jax.jit(
        synthetic_batch_fn(mesh_db, n_eval, input_res, f=400.0)
    )(jax.random.PRNGKey(9999))

    # (a/b) refiner-only: noised GT init -> N refiner iterations.
    key = jax.random.PRNGKey(7)
    TCO_init = add_pose_noise(
        key, eval_batch.TCO, euler_deg_std=(15, 15, 15),
        trans_std=(0.01, 0.01, 0.05),
    )
    meshes = mesh_db.select(eval_batch.mesh_idx)

    def refine_n(params, TCO, n):
        def body(T, _):
            out = refiner.apply(
                params, eval_batch.rgbs, eval_batch.K, T, meshes,
                method=PosePredictor.refine_step,
            )
            return out["TCO_output"], None

        return jax.lax.scan(body, TCO, None, length=n)[0]

    n_it = int(args["refine_iters"])
    TCO_refined = jax.jit(refine_n, static_argnums=2)(
        ref_state.params, TCO_init, n_it
    )
    pts = meshes.points[:, :256]
    add0, rot0, tr0 = pose_errors(TCO_init, eval_batch.TCO, pts)
    add1, rot1, tr1 = pose_errors(TCO_refined, eval_batch.TCO, pts)

    # (c) full pipeline from GT boxes on single-object observations.
    est = PoseEstimator(
        coarse, coarse_state.params, refiner, ref_state.params, mesh_db,
        InferenceConfig(
            SO3_grid_size=int(args["so3"]),
            n_refiner_iterations=n_it,
            n_pose_hypotheses=4,
            bsz_images=64,
            bsz_objects=16,
            max_detections=1,
        ),
    )
    pipe_add, pipe_rot, pipe_tr = [], [], []
    labels = list(mesh_db.labels)
    for i in range(min(n_eval, 8)):
        obs = ObservationTensor(
            images=np.asarray(eval_batch.rgbs[i : i + 1]),
            K=np.asarray(eval_batch.K[i : i + 1]),
        )
        det = make_detections(
            [labels[int(eval_batch.mesh_idx[i])]],
            np.asarray(eval_batch.bboxes[i : i + 1]),
        )
        data, _ = est.run_inference_pipeline(obs, det)
        a, r, t = pose_errors(
            data.poses, np.asarray(eval_batch.TCO[i : i + 1]),
            pts[i : i + 1],
        )
        pipe_add.append(float(a[0]))
        pipe_rot.append(float(r[0]))
        pipe_tr.append(float(t[0]))

    diam = float(np.asarray(mesh_db.diameters).mean())
    report = {
        "device": str(jax.devices()[0]),
        "refiner_losses": ref_losses,
        "coarse_losses": coarse_losses,
        "refine_iters": n_it,
        "init": {
            "add_median": float(np.median(add0)),
            "rot_deg_median": float(np.median(rot0)),
            "trans_median": float(np.median(tr0)),
        },
        "refined": {
            "add_median": float(np.median(add1)),
            "rot_deg_median": float(np.median(rot1)),
            "trans_median": float(np.median(tr1)),
            "add_improved_frac": float((add1 < add0).mean()),
        },
        "pipeline": {
            "add_median": float(np.median(pipe_add)),
            "rot_deg_median": float(np.median(pipe_rot)),
            "trans_median": float(np.median(pipe_tr)),
            "add_below_0.1d_frac": float(
                (np.asarray(pipe_add) < 0.1 * diam).mean()
            ),
        },
        "mean_diameter": diam,
    }
    (out_dir / "report.json").write_text(json.dumps(report, indent=2))
    logger.info(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
