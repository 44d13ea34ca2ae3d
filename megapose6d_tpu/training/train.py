"""Training loop: sharded train step, optimizer/schedule, checkpoints, logs.

TPU-native re-design of the reference's `train_megapose`
(megapose6d: src/megapose/training/train_megapose.py:75-412):
  - DDP/NCCL + AMP GradScaler -> one jitted train step, data-parallel over a
    `jax.sharding.Mesh` (gradients reduced by XLA over ICI), bf16 compute via
    the model's dtype policy (no loss scaling needed — f32 master params).
  - file-based config/weight broadcast -> not needed: params are created
    once and sharded by GSPMD.
  - warmup + step-decay LR (training/utils.py:make_lr_ratio_function:128)
    reproduced as an optax schedule in steps.
  - checkpoint.pth.tar landscape -> orbax checkpoints in the same
    {run_dir/config.json, checkpoints/} layout (SURVEY.md §5.4).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ..meshes.mesh_db import BatchedMeshes
from ..models.pose_predictor import PosePredictor
from ..parallel import mesh as mesh_lib
from ..ops import rasterizer
from ..ops.camera import masked_boxes_from_uv, project_points_robust
from ..ops.so3_grid import super_fibonacci_quats
from ..ops.se3 import make_se3, rotmat_from_quat
from .config import TrainingConfig
from .forward_loss import BatchPoseData, forward_loss

Array = jax.Array


class TrainState(train_state.TrainState):
    pass


def make_lr_schedule(cfg: TrainingConfig, steps_per_epoch: int):
    """warmup(n_epochs_warmup) then 10x decay every lr_epoch_decay epochs
    (training/utils.py:128-144)."""

    warmup_steps = max(1, cfg.n_epochs_warmup * steps_per_epoch)
    decay_steps = max(1, cfg.lr_epoch_decay * steps_per_epoch)

    def schedule(step):
        warm = jnp.minimum((step + 1) / warmup_steps, 1.0)
        decay = 0.1 ** (step // decay_steps)
        return cfg.lr * warm * decay

    return schedule


def make_optimizer(cfg: TrainingConfig, steps_per_epoch: int):
    """Adam + grad clip (train_megapose.py:250-266, 313-321)."""
    sched = make_lr_schedule(cfg, steps_per_epoch)
    if cfg.weight_decay > 0:
        opt = optax.adamw(learning_rate=sched, weight_decay=cfg.weight_decay)
    else:
        opt = optax.adam(learning_rate=sched)
    return optax.chain(optax.clip_by_global_norm(cfg.clip_grad_norm), opt)


def create_train_state(
    cfg: TrainingConfig,
    model: PosePredictor,
    mesh_db: BatchedMeshes,
    key: Array,
    input_res: tuple[int, int] | None = None,
) -> TrainState:
    res = tuple(input_res or cfg.input_resize)
    c = 4 if cfg.input_depth else 3
    dummy_images = jnp.zeros((1,) + res + (c,), jnp.float32)
    dummy_K = jnp.eye(3)[None] * 100.0
    dummy_T = jnp.eye(4)[None].at[0, 2, 3].set(0.5)
    meshes1 = mesh_db.select(jnp.zeros((1,), jnp.int32))
    if jax.default_backend() == "cpu":
        params = model.init(key, dummy_images, dummy_K, dummy_T, meshes1)
    else:
        # Init on the host CPU with the render bypassed (param values
        # are a function of shapes + rng only, so they are identical),
        # then transfer once. Un-jitted init on the device executes
        # op-by-op over the TPU tunnel (~6 min per invocation).
        from ..models.pose_predictor import skip_render_for_init

        cpu = jax.devices("cpu")[0]
        args_cpu = jax.device_put(
            (key, dummy_images, dummy_K, dummy_T, meshes1), cpu
        )
        with skip_render_for_init():
            params = model.init(*args_cpu)
        params = jax.device_put(params, jax.devices()[0])
    steps_per_epoch = max(1, cfg.epoch_size // cfg.batch_size)
    tx = make_optimizer(cfg, steps_per_epoch)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def make_train_step(
    model: PosePredictor, cfg: TrainingConfig, mesh_db: BatchedMeshes
) -> Callable:
    """Jitted (state, batch, key, n_iterations) -> (state, metrics).

    Under a Mesh, shard `batch` on the dp axis and keep state replicated;
    GSPMD inserts the gradient all-reduce over ICI.
    """

    def step(state: TrainState, batch: BatchPoseData, key: Array, n_iterations: int):
        def loss_fn(params):
            loss, metrics = forward_loss(
                params, model, cfg, batch, mesh_db, key, n_iterations
            )
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        gnorm = optax.global_norm(grads)
        state = state.apply_gradients(grads=grads)
        metrics = dict(metrics)
        metrics["grad_norm"] = gnorm
        return state, metrics

    return jax.jit(step, static_argnums=(3,), donate_argnums=(0,))


def make_sharded_train_step(
    model: PosePredictor,
    cfg: TrainingConfig,
    sharded_db,
    device_mesh,
    axis: str = "dp",
) -> Callable:
    """Train step for a label-sharded mesh DB (`meshes.sharded_db`):
    each device renders/selects only from ITS OWN label shard (mesh_idx in
    the batch is LOCAL to the device's shard) and gradients are psum'd
    over the dp axis — the TPU analog of the reference's per-rank object
    split + DDP all-reduce (train_megapose.py:94-112, :246-248).

    Batch arrays must have leading dim n_shards * batch_per_shard, laid
    out shard-major, and be placed with `NamedSharding(mesh, P(axis))`.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    db = sharded_db.batched

    def step(state: TrainState, batch: BatchPoseData, key: Array,
             n_iterations: int):
        def shard_fn(params, db_local, batch_local, key):
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))

            def loss_fn(p):
                return forward_loss(
                    p, model, cfg, batch_local, db_local, key, n_iterations
                )

            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            grads = jax.lax.pmean(grads, axis)
            metrics = jax.tree.map(lambda m: jax.lax.pmean(m, axis), metrics)
            return grads, metrics

        db_leaves_spec = jax.tree.map(lambda _: P(axis), db)
        batch_spec = jax.tree.map(lambda _: P(axis), batch)
        grads, metrics = shard_map(
            shard_fn,
            mesh=device_mesh,
            in_specs=(P(), db_leaves_spec, batch_spec, P()),
            out_specs=(P(), P()),
            check_rep=False,
        )(state.params, db, batch, key)
        gnorm = optax.global_norm(grads)
        state = state.apply_gradients(grads=grads)
        metrics = dict(metrics)
        metrics["grad_norm"] = gnorm
        return state, metrics

    return jax.jit(step, static_argnums=(3,), donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Synthetic on-device data source (debug/overfit; the reference's analog is
# the debug/overfit config shrink, run_megapose_training.py:275-295 — we can
# additionally *generate* observations with the in-graph renderer).
# ---------------------------------------------------------------------------

def synthetic_batch_fn(
    mesh_db: BatchedMeshes,
    batch_size: int,
    input_res: tuple[int, int] = (240, 320),
    f: float = 400.0,
    z_range: tuple[float, float] = (0.35, 0.9),
    face_chunk: int = 64,
    renderer: str | None = None,
    domain_rand: bool = False,
    occlude: bool = False,
) -> Callable[[Array], BatchPoseData]:
    """Returns a jittable `key -> BatchPoseData` that renders random GT
    scenes of DB objects. Used by overfit tests, the multi-chip dryrun, and
    the benchmark harness.

    `renderer`: "tiled" | "scan" | None (auto: the Pallas kernel on
    accelerators — ~25x the scan baseline, worth ~0.5 s/step at batch 32
    on v5e — and the scan path on CPU where interpret-mode Pallas is the
    slower of the two).

    `domain_rand=True` randomizes the OBSERVATION domain per sample —
    ambient/point lighting draws plus a procedural background composited
    behind the object — the reference's PBR-images + VOC-background-
    augmentation recipe (train_megapose.py dataset configs,
    augmentations.py VOCBackgroundAugmentation). Models trained with the
    default unlit black-background observations collapse on lit/cluttered
    inputs (the round-4 AR root cause, NEXT.md); hypothesis RENDERS stay
    unlit in both modes, matching the reference's contrast between
    augmented observations and canonical renders.

    `occlude=True` z-composites a SECOND random object in front of /
    beside the target so training observations carry partial occlusion
    (the reference trains on multi-object PBR scenes with visibility
    filtering, datasets/pose_dataset.py:108-333; single-object training
    leaves 2-object occlusion out-of-distribution — round-4/5 AR-table
    residual gap). The GT pose/bbox stay those of the TARGET object."""
    if renderer is None:
        renderer = "scan" if jax.default_backend() == "cpu" else "tiled"
    H, W = input_res
    K1 = jnp.asarray(
        [[f, 0.0, W / 2 - 0.5], [0.0, f, H / 2 - 0.5], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    # A fixed quaternion pool for cheap random rotations.
    quat_pool = jnp.asarray(super_fibonacci_quats(4096), jnp.float32)

    def fn(key: Array) -> BatchPoseData:
        # Keep the historical 4-way split so domain_rand=False batches are
        # bit-identical to earlier runs (eval sets in runs/*/history.json
        # depend on it); extra draws come from fold_in.
        k1, k2, k3, k4 = jax.random.split(key, 4)
        k5 = jax.random.fold_in(key, 101)
        k6 = jax.random.fold_in(key, 102)
        k7 = jax.random.fold_in(key, 103)
        L = mesh_db.n_labels
        mesh_idx = jax.random.randint(k1, (batch_size,), 0, L)
        q = quat_pool[jax.random.randint(k2, (batch_size,), 0, len(quat_pool))]
        R = rotmat_from_quat(q)
        z = jax.random.uniform(
            k3, (batch_size, 1), minval=z_range[0], maxval=z_range[1]
        )
        xy = jax.random.uniform(k4, (batch_size, 2), minval=-0.05, maxval=0.05)
        TCO = make_se3(R, jnp.concatenate([xy * z, z], -1))
        meshes = mesh_db.select(mesh_idx)
        K = jnp.broadcast_to(K1, (batch_size, 3, 3))
        if domain_rand:
            # Per-sample lighting draws (rasterizer broadcasts [B] arrays).
            amb = jax.random.uniform(
                k5, (batch_size,), minval=0.5, maxval=1.0
            )
            pnt = jax.random.uniform(k6, (batch_size,), minval=0.0, maxval=0.5)
            light_kw = dict(light_ambient=amb, light_point=pnt)
        else:
            light_kw = dict(light_ambient=1.0, light_point=0.0)
        def _render(m, T):
            tex_kw = {}
            if (
                m.textures is not None
                and m.uvs is not None
                and m.has_tex is not None
            ):
                tex_kw = dict(
                    uvs=m.uvs, textures=m.textures, has_tex=m.has_tex
                )
            render_args = (
                m.vertices, m.normals, m.colors, m.faces,
                m.face_valid, T, K, (H, W),
            )
            if renderer == "tiled":
                from ..ops import rasterizer_tiled

                return rasterizer_tiled.render_meshes_tiled(
                    *render_args, backface_cull=True,
                    interpret=jax.default_backend() == "cpu",
                    **light_kw, **tex_kw,
                )
            return rasterizer.render_meshes(
                *render_args, chunk=face_chunk, **light_kw, **tex_kw,
            )

        out = _render(meshes, TCO)
        rgbs = out.rgb
        fg_mask = out.mask
        if occlude:
            # Second random object z-composited over the target (fresh
            # fold_in draws so the default PRNG streams stay untouched).
            ko1 = jax.random.fold_in(key, 104)
            ko2 = jax.random.fold_in(key, 105)
            ko3 = jax.random.fold_in(key, 106)
            mesh_idx2 = jax.random.randint(ko1, (batch_size,), 0, L)
            q2 = quat_pool[
                jax.random.randint(ko2, (batch_size,), 0, len(quat_pool))
            ]
            # Beside the target (3-9 cm lateral) and slightly closer to
            # the camera, so the occluder wins the z-merge where the
            # silhouettes overlap.
            off = jax.random.uniform(
                ko3, (batch_size, 3),
                minval=jnp.asarray([-0.09, -0.09, -0.12]),
                maxval=jnp.asarray([0.09, 0.09, -0.02]),
            )
            sign = jnp.where(off[:, :2] >= 0, 1.0, -1.0)
            off = off.at[:, :2].add(sign * 0.03)
            TCO2 = make_se3(
                rotmat_from_quat(q2), TCO[:, :3, 3] + off
            )
            out2 = _render(mesh_db.select(mesh_idx2), TCO2)
            d1 = jnp.where(out.mask, out.depth, jnp.inf)
            d2 = jnp.where(out2.mask, out2.depth, jnp.inf)
            occ = out2.mask & (d2 < d1)
            rgbs = jnp.where(occ[..., None], out2.rgb, rgbs)
            fg_mask = out.mask | out2.mask
        if domain_rand:
            # Procedural background behind the object (lazy import: no
            # scripts -> training cycle exists, but keep the training
            # module import-light).
            from ..scripts.generate_synthetic_dataset import (
                _random_background,
            )

            bg = jax.vmap(lambda k: _random_background(k, (H, W)))(
                jax.random.split(k7, batch_size)
            )
            rgbs = jnp.where(fg_mask[..., None], rgbs, bg.astype(rgbs.dtype))
        uv = project_points_robust(meshes.points, K, TCO)
        bboxes = masked_boxes_from_uv(
            uv, jnp.ones(uv.shape[:2], bool)
        )
        return BatchPoseData(
            rgbs=rgbs, K=K, TCO=TCO, bboxes=bboxes, mesh_idx=mesh_idx
        )

    return fn


# ---------------------------------------------------------------------------
# Checkpointing (SURVEY.md §5.4 layout)
# ---------------------------------------------------------------------------

def save_checkpoint(run_dir: str | Path, state: TrainState, epoch: int) -> None:
    """Full training state: params + optimizer state + step (the reference
    saves weights+epoch only and reconstructs LR arithmetically,
    train_megapose.py:225-258; saving opt state makes resume exact)."""
    import orbax.checkpoint as ocp

    path = Path(run_dir).absolute() / "checkpoints" / f"epoch_{epoch}"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        path,
        {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
        },
        force=True,
    )
    ckptr.wait_until_finished()
    latest = Path(run_dir) / "checkpoints" / "latest.txt"
    latest.write_text(str(epoch))


def load_checkpoint(
    run_dir: str | Path,
    state: TrainState,
    epoch: int | None = None,
    params_only: bool = False,
):
    """Restore a checkpoint into `state`. `params_only=True` is the
    pretrain-init path (run_id_pretrain, train_megapose.py:219-223): weights
    come from the checkpoint, optimizer/step restart fresh."""
    import orbax.checkpoint as ocp

    run_dir = Path(run_dir)
    if epoch is None:
        epoch = int((run_dir / "checkpoints" / "latest.txt").read_text())
    path = (run_dir / "checkpoints" / f"epoch_{epoch}").absolute()
    ckptr = ocp.StandardCheckpointer()
    if params_only:
        # The checkpoint also holds opt_state/step; partial-restore just the
        # weights (pretrain-init must work even when the optimizer tree of
        # the new run differs from the saved one). Restore args carry the
        # TARGET arrays' shardings so a TPU-saved checkpoint loads on CPU
        # (and vice versa) — without them orbax resolves the saved device
        # and fails off-platform.
        restored = ocp.PyTreeCheckpointer().restore(
            path,
            args=ocp.args.PyTreeRestore(
                item={"params": state.params},
                restore_args=ocp.checkpoint_utils.construct_restore_args(
                    {"params": state.params}
                ),
                partial_restore=True,
            ),
        )
        return state.replace(params=restored["params"]), epoch

    def abstract(tree):
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(
                jnp.shape(x), jnp.result_type(x), sharding=x.sharding
            )
            if hasattr(x, "sharding")
            else x,
            tree,
        )

    try:
        restored = ckptr.restore(
            path,
            abstract(
                {
                    "params": state.params,
                    "opt_state": state.opt_state,
                    "step": state.step,
                }
            ),
        )
        return (
            state.replace(
                params=restored["params"],
                opt_state=restored["opt_state"],
                step=restored["step"],
            ),
            epoch,
        )
    except (KeyError, ValueError, FileNotFoundError):
        # Older checkpoints carried params+step only.
        restored = ckptr.restore(
            path, abstract({"params": state.params, "step": state.step})
        )
        return (
            state.replace(params=restored["params"], step=restored["step"]),
            epoch,
        )


# ---------------------------------------------------------------------------
# Loop
# ---------------------------------------------------------------------------

def train(
    cfg: TrainingConfig,
    model: PosePredictor,
    mesh_db: BatchedMeshes,
    batch_iterator: Iterator[BatchPoseData],
    run_dir: str | Path | None = None,
    n_epochs: int | None = None,
    steps_per_epoch: int | None = None,
    log_fn: Callable[[dict], None] | None = None,
    device_mesh=None,
    input_res: tuple[int, int] | None = None,
    val_iterator: Iterator[BatchPoseData] | None = None,
    n_val_batches: int = 4,
) -> TrainState:
    """Generic loop over a batch iterator (host or device side).

    Mirrors train_megapose.py:268-412: per-epoch metric averages, JSON-line
    logs, periodic checkpoints, iteration-count ramp.
    """
    run_dir = Path(run_dir or Path(cfg.run_dir) / cfg.run_id)
    run_dir.mkdir(parents=True, exist_ok=True)
    from .config import save_config

    save_config(cfg, run_dir / "config.json")

    base_key = jax.random.PRNGKey(cfg.seed)
    state = create_train_state(
        cfg, model, mesh_db, base_key, input_res=input_res
    )

    # Resume / pretrain init (train_megapose.py:219-241 semantics; unlike
    # the reference, optimizer state + step are restored too, so LR and
    # Adam moments continue exactly).
    start_epoch = 1
    if cfg.resume_run_id:
        resume_dir = Path(cfg.run_dir) / cfg.resume_run_id
        state, ckpt_epoch = load_checkpoint(resume_dir, state)
        start_epoch = ckpt_epoch + 1
    elif cfg.pretrain_run_id:
        pretrain_dir = Path(cfg.run_dir) / cfg.pretrain_run_id
        state, _ = load_checkpoint(pretrain_dir, state, params_only=True)

    step_fn = make_train_step(model, cfg, mesh_db)

    n_epochs = n_epochs or cfg.n_epochs
    steps_per_epoch = steps_per_epoch or max(1, cfg.epoch_size // cfg.batch_size)
    log_path = run_dir / "log.txt"

    val_loss_fn = None
    if val_iterator is not None:
        # Forward-only loss (no grads/update), jitted once.
        val_loss_fn = jax.jit(
            lambda params, batch, key, n_it: forward_loss(
                params, model, cfg, batch, mesh_db, key, n_it
            )[0],
            static_argnums=(3,),
        )

    for epoch in range(start_epoch, n_epochs + 1):
        if cfg.add_iteration_epoch_interval > 0:
            n_iter = min(
                epoch // cfg.add_iteration_epoch_interval + 1, cfg.n_iterations
            )
        else:
            n_iter = cfg.n_iterations
        sums: dict[str, float] = {}
        t0 = time.monotonic()
        for _ in range(steps_per_epoch):
            batch = next(batch_iterator)
            if device_mesh is not None:
                batch = mesh_lib.shard_batch(batch, device_mesh)
            # Key derived from the optimizer step, not a sequential split:
            # a resumed run replays the exact key sequence of the original.
            sub = jax.random.fold_in(base_key, int(state.step))
            state, metrics = step_fn(state, batch, sub, n_iter)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        log = {k: v / steps_per_epoch for k, v in sums.items()}
        log.update(
            epoch=epoch,
            n_iterations=n_iter,
            time_per_epoch=time.monotonic() - t0,
        )
        # Validation (train_megapose.py:356-369).
        if (
            val_loss_fn is not None
            and epoch % max(1, cfg.val_epoch_interval) == 0
        ):
            val_losses = []
            val_key = jax.random.fold_in(base_key, 2**30 + epoch)
            for i in range(n_val_batches):
                vb = next(val_iterator)
                if device_mesh is not None:
                    vb = mesh_lib.shard_batch(vb, device_mesh)
                sub = jax.random.fold_in(val_key, i)
                val_losses.append(
                    float(val_loss_fn(state.params, vb, sub, n_iter))
                )
            log["val_loss"] = float(np.mean(val_losses))
        with open(log_path, "a") as fh:
            fh.write(json.dumps(log) + "\n")
        if log_fn:
            log_fn(log)
        if epoch % cfg.save_epoch_interval == 0 or epoch == n_epochs:
            save_checkpoint(run_dir, state, epoch)
    return state
