"""Benchmark harness — prints ONE JSON line with the north-star metric.

Metric (BASELINE.json): poses/sec/chip end-to-end (coarse scoring of the
full 576-rotation SO(3) grid + top-K selection + 5 refiner iterations +
re-scoring), plus hypothesis renders/sec as a secondary key.

Crash-robust by construction (VERDICT r3 weak #1): every stage runs in
its own SUBPROCESS holding the TPU exclusively, so a RESOURCE_EXHAUSTED
in one configuration can no longer erase numbers already measured — the
orchestrator (this process, which never initializes a JAX backend)
records each stage's JSON as it lands, logs it incrementally to stderr,
and emits the final aggregate even if some stages died. Stages share the
persistent XLA compilation cache, which the harness itself validates:
the best pipeline config is compiled cold in its sweep stage and again
in a fresh process for the phase split, so `first_call_s_cold` vs
`first_call_s_warm` measures the cache across processes.

The detection count per image is swept (1, 8) and the best-throughput
configuration is reported, mirroring the reference's multi-instance BOP
scenes (its own micro-batching amortizes the same way:
reference inference/types.py:99-100, bsz_images=576 across instances).
Secondary keys: per-phase milliseconds (phased-mode run), an MFU
estimate from the compiled pipeline's XLA cost analysis, and renders/s
at both bench scale (~3k faces) and real BOP scale (~33k faces).

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is a DERIVED estimate of the PyTorch+Panda3D pipeline on a
V100-class GPU, built from the reference's own structure:
  per detection: 576 coarse renders at 240x320 through the Panda3D
  process farm (~400 renders/s incl. readback+IPC+H2D at n_workers=8),
  576 coarse CNN forwards (ResNet34 ~7.3 GFLOP @ 240x320, ~40% util of
  15 TFLOP/s fp16), 5 refiner hypotheses x 5 iterations x 4 views = 100
  renders + 25 refiner forwards, + rescoring. Total ~= 2.6 s/detection
  => ~0.4 poses/s/GPU. Consistent with the paper's "a few seconds per
  object" (arXiv:2212.06870). Clearly labeled an estimate, not a
  measurement: vs_baseline = poses_per_s / 0.4.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_POSES_PER_S = 0.4  # derived estimate, see module docstring


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# Worker-side stages (each runs in its own process; `import jax` only here)
# --------------------------------------------------------------------------

def build_world(big=False):
    from megapose6d_tpu.meshes import (
        MeshDataBase,
        RigidObject,
        RigidObjectDataset,
        make_cube,
        make_uv_sphere,
    )

    if big:
        # ~33k-face mesh (raw BOP scan scale; T-LESS/YCB-V models run
        # 20-60k faces before LOD) + a decimated coarse LOD.
        objs = RigidObjectDataset(
            [RigidObject(label="obj1", mesh=make_uv_sphere(0.05, 130, 130))]
        )
        db = MeshDataBase.from_object_ds(
            objs, max_faces=34048, n_points=1000, n_sym=8
        )
        db_coarse = MeshDataBase.from_object_ds(
            objs, max_faces=2048, n_points=1000, n_sym=8
        )
        return db.batched(align=128), db_coarse.batched(align=128)

    # BOP-scale procedural meshes (~3k faces after padding).
    objs = RigidObjectDataset(
        [
            RigidObject(label="obj1", mesh=make_uv_sphere(0.05, 40, 40)),
            RigidObject(label="obj2", mesh=make_cube(0.04)),
        ]
    )
    db = MeshDataBase.from_object_ds(objs, max_faces=3200, n_points=1000, n_sym=8)
    # Low-LOD variant for the coarse scorer (silhouette-level fidelity;
    # render cost is linear in face count).
    db_coarse = MeshDataBase.from_object_ds(
        objs, max_faces=768, n_points=1000, n_sym=8
    )
    return db.batched(align=128), db_coarse.batched(align=128)


def bench_renders(mesh_db, n_hyp=192, iters=5, resolution=(240, 320),
                  mode="tiled", hyp_pack=1):
    import jax
    import jax.numpy as jnp

    from megapose6d_tpu.ops import rasterizer
    from megapose6d_tpu.ops.rasterizer_tiled import render_meshes_tiled
    from megapose6d_tpu.ops.se3 import make_se3
    from megapose6d_tpu.ops.so3_grid import make_so3_grid

    idx = jnp.zeros((n_hyp,), jnp.int32)
    meshes = mesh_db.select(idx)
    R = make_so3_grid(n_hyp)
    t = jnp.asarray([[0.0, 0.0, 0.5]] * n_hyp)
    TCO = make_se3(R, t)
    K = jnp.asarray(
        [[[600.0, 0, 160], [0, 600.0, 120], [0, 0, 1]]] * n_hyp, jnp.float32
    )
    args = (
        meshes.vertices, meshes.normals, meshes.colors, meshes.faces,
        meshes.face_valid,
    )

    @jax.jit
    def render(TCO):
        if mode == "tiled":
            out = render_meshes_tiled(
                *args, TCO, K, resolution, backface_cull=True,
                hyp_pack=hyp_pack,
                interpret=jax.default_backend() == "cpu",
            )
        else:
            out = rasterizer.render_meshes(*args, TCO, K, resolution, chunk=128)
        return out.rgb.sum(), out.depth.sum()

    render(TCO)[0].block_until_ready()  # compile
    t0 = time.monotonic()
    for _ in range(iters):
        render(TCO)[0].block_until_ready()
    dt = (time.monotonic() - t0) / iters
    return n_hyp / dt


def make_estimator(mesh_db, mesh_db_coarse, n_detections, hyp_pack=1,
                   prune=0, prune_keep=8, coarse_res=None,
                   coarse_input=None, beam=0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from megapose6d_tpu.inference import InferenceConfig, PoseEstimator
    from megapose6d_tpu.models import (
        PosePredictor,
        make_coarse_config,
        make_refiner_config,
    )

    render = (240, 320)
    dtype = "bfloat16" if jax.devices()[0].platform != "cpu" else "float32"
    # coarse_input: a NATIVELY small coarse scorer (render_size +
    # observation crop both at the low resolution, so the CNN shrinks
    # too — vs coarse_res which only lowers the raster and upsamples for
    # the full-size CNN). Gated on the committed coarse_small_ab A/B.
    coarse = PosePredictor(
        make_coarse_config(
            render_size=tuple(coarse_input) if coarse_input else render,
            compute_dtype=dtype, tile_hyp_pack=hyp_pack,
        )
    )
    refiner = PosePredictor(
        make_refiner_config(
            render_size=render, compute_dtype=dtype, tile_hyp_pack=hyp_pack
        )
    )

    img_res = (480, 640)
    K = np.asarray([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]], np.float32)
    TCO0 = np.eye(4, dtype=np.float32)
    TCO0[2, 3] = 0.55
    meshes1 = mesh_db.select(jnp.zeros((1,), jnp.int32))
    imgs = jnp.zeros((1,) + img_res + (3,), jnp.float32)
    T0 = jnp.asarray(TCO0)[None]
    # Throughput does not depend on weight values, so build the param
    # trees from shapes only: real flax .init runs the whole model
    # EAGERLY (one tunnel round-trip per op, ~6 min of the r04 stage
    # timeouts); eval_shape traces on the host in seconds.
    rng = jax.random.PRNGKey(0)

    def shaped_params(model):
        shapes = jax.eval_shape(
            model.init, rng, imgs, jnp.asarray(K)[None], T0, meshes1
        )
        return jax.tree.map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes
        )

    cparams = shaped_params(coarse)
    rparams = shaped_params(refiner)

    cfg = InferenceConfig(
        SO3_grid_size=576,
        SO3_prune_grid_size=prune,
        SO3_prune_keep=prune_keep,
        n_refiner_iterations=5,
        # beam: refiner-phase hypothesis count (n_pose_hypotheses) —
        # promoted below 5 only by a committed combo A/B with top_k.
        n_pose_hypotheses=beam or 5,
        bsz_images=192,
        bsz_objects=16,
        max_detections=n_detections,
        fused_pipeline=True,
        coarse_render_size=tuple(coarse_res) if coarse_res else None,
    )
    est = PoseEstimator(
        coarse, cparams, refiner, rparams, mesh_db, cfg,
        mesh_db_coarse=mesh_db_coarse,
    )
    return est, K


def bench_pipeline(mesh_db, mesh_db_coarse, n_detections, hyp_pack=1,
                   want_mfu=False, want_phases=False, tag="", prune=0,
                   prune_keep=8, coarse_res=None, coarse_input=None,
                   beam=0):
    """poses/s with `n_detections` objects per image (amortizes dispatch +
    fixed pipeline costs the way real BOP scenes do).

    Returns a dict with poses_per_s / dt_s / compile_s and optionally
    `mfu` / `flops_per_image` (XLA cost analysis of the fused program)
    and `phase_ms` (per-phase wall ms from a phased-mode run)."""
    import dataclasses

    import numpy as np

    from megapose6d_tpu.data import ObservationTensor
    from megapose6d_tpu.inference import make_detections

    t_setup = time.monotonic()
    est, K = make_estimator(
        mesh_db, mesh_db_coarse, n_detections, hyp_pack=hyp_pack,
        prune=prune, prune_keep=prune_keep, coarse_res=coarse_res,
        coarse_input=coarse_input, beam=beam,
    )
    log(f"[{tag or n_detections}] estimator built in "
        f"{time.monotonic()-t_setup:.0f}s")
    img_res = (480, 640)

    # Host-synthesized observation: pipeline THROUGHPUT is independent
    # of image content (fixed hypothesis/render/CNN workload), and any
    # on-device observation render costs minutes of compile on the
    # tunnel chip (r04: 3.5-5 min per pipeline stage, eager or jitted).
    # A textured disc roughly where the detection boxes point keeps the
    # crops non-degenerate.
    yy, xx = np.mgrid[0:img_res[0], 0:img_res[1]].astype(np.float32)
    r2 = (xx - 320.0) ** 2 + (yy - 240.0) ** 2
    disc = (r2 < 55.0**2).astype(np.float32)
    tex = 0.5 + 0.25 * np.sin(xx * 0.37) * np.cos(yy * 0.29)
    img = np.stack([disc * tex, disc * 0.5 * tex, disc * 0.25], -1)
    obs = ObservationTensor(
        images=img[None].astype(np.float32), K=K[None]
    )

    half = 600 * 0.05 / 0.55
    # n_detections boxes spread around the image center.
    rng = np.random.RandomState(0)
    cx = 320 + rng.uniform(-40, 40, size=n_detections)
    cy = 240 + rng.uniform(-30, 30, size=n_detections)
    boxes = np.stack(
        [cx - half, cy - half, cx + half, cy + half], axis=1
    ).astype(np.float32)
    detections = make_detections(["obj1"] * n_detections, boxes)

    label = tag or f"D={n_detections},pack={hyp_pack}"
    log(f"[{label}] compiling pipeline...")
    t0 = time.monotonic()
    est.run_inference_pipeline(obs, detections)
    compile_s = time.monotonic() - t0
    log(f"[{label}] first call (incl. compile): {compile_s:.1f}s")

    iters = 3
    t0 = time.monotonic()
    for _ in range(iters):
        out, extra = est.run_inference_pipeline(obs, detections)
    dt = (time.monotonic() - t0) / iters
    log(f"[{label}] steady-state: {dt*1000:.0f} ms/image, "
        f"{n_detections/dt:.2f} poses/s")

    res = {
        "poses_per_s": n_detections / dt,
        "dt_s": dt,
        "compile_s": round(compile_s, 1),
    }
    if want_mfu:
        try:
            # Trip-count-corrected model FLOPs (XLA cost analysis counts
            # lax.map/scan bodies once; see fused_pipeline_flops_estimate).
            cost = est.fused_pipeline_flops_estimate(obs)
            flops = float(cost["flops"])
            # bf16 peak of one v5e chip (197 TFLOP/s); the phase mix is
            # conv/matmul-dominated so this is the right denominator.
            peak = 197e12
            res["flops_per_image"] = flops
            res["flops_split"] = {
                k: round(v, 1) for k, v in cost.items() if k != "flops"
            }
            res["mfu"] = flops / dt / peak
            log(f"[{label}] flops/image={flops:.3e}  MFU={res['mfu']:.3f}")
        except Exception as e:  # cost analysis is best-effort
            log(f"[{label}] cost analysis unavailable: {e}")
    if want_phases:
        # Phased mode (separate XLA programs + host syncs per phase) on
        # the same estimator: its timing_ dict is the CudaTimer-split
        # analog (reference inference/pose_estimator.py timing fields).
        est.cfg = dataclasses.replace(est.cfg, fused_pipeline=False)
        est.run_inference_pipeline(obs, detections)  # compile phases
        t0 = time.monotonic()
        est.run_inference_pipeline(obs, detections)
        phased_dt = time.monotonic() - t0
        res["phase_ms"] = {
            k: round(v * 1000, 1) for k, v in est.timing_.items()
        }
        res["phased_total_ms"] = round(phased_dt * 1000, 1)
        log(f"[{label}] phases: {res['phase_ms']} "
            f"(phased total {phased_dt*1000:.0f} ms)")
    return res


def run_worker(spec):
    """Execute one stage in this (child) process; return a JSON-able dict."""
    import jax

    from megapose6d_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    dev = str(jax.devices()[0])
    stage = spec["stage"]
    if stage == "renders":
        mesh_db, _ = build_world(big=spec.get("big", False))
        rps = bench_renders(
            mesh_db,
            n_hyp=spec.get("n_hyp", 192),
            mode=spec.get("mode", "tiled"),
            hyp_pack=spec.get("pack", 1),
        )
        return {"renders_per_sec": round(rps, 1), "device": dev}
    if stage == "pipeline":
        mesh_db, mesh_db_coarse = build_world(big=spec.get("big", False))
        res = bench_pipeline(
            mesh_db, mesh_db_coarse, spec["D"],
            hyp_pack=spec.get("pack", 1),
            want_mfu=spec.get("mfu", False),
            want_phases=spec.get("phases", False),
            prune=spec.get("prune", 0),
            prune_keep=spec.get("prune_keep", 8),
            coarse_res=spec.get("coarse_res"),
            coarse_input=spec.get("coarse_input"),
            beam=spec.get("beam", 0),
            tag=spec.get("tag", ""),
        )
        res["device"] = dev
        return res
    raise ValueError(f"unknown stage {stage}")


# --------------------------------------------------------------------------
# Orchestrator (never initializes a JAX backend; TPU belongs to children)
# --------------------------------------------------------------------------

RESULT_MARK = "BENCH_STAGE_RESULT:"


def run_stage(spec, timeout=900):
    """Run one stage in a subprocess; return its result dict or None."""
    tag = spec.get("tag") or spec["stage"]
    t0 = time.monotonic()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             json.dumps(spec)],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        # Killing a TPU process mid-op wedges the device claim for ~1min;
        # wait it out so the NEXT stage doesn't fail on a stale claim.
        log(f"[stage {tag}] TIMEOUT after {timeout}s; letting the device "
            "claim expire (75s)")
        time.sleep(75)
        return None
    for line in proc.stderr.splitlines():
        log(f"  | {line}")
    out = None
    for line in proc.stdout.splitlines():
        if line.startswith(RESULT_MARK):
            out = json.loads(line[len(RESULT_MARK):])
    if proc.returncode != 0 or out is None:
        log(f"[stage {tag}] FAILED rc={proc.returncode} "
            f"({time.monotonic()-t0:.0f}s); stdout tail: "
            f"{proc.stdout[-500:]!r}")
        return None
    log(f"[stage {tag}] ok in {time.monotonic()-t0:.0f}s: "
        f"PARTIAL {json.dumps(out)}")
    return out


def _load_ab_reports():
    """All committed demo_finalize_pipeline reports, newest mtime first
    (runs/final_pipeline*/report.json)."""
    import glob

    root = os.path.dirname(os.path.abspath(__file__))
    paths = glob.glob(os.path.join(root, "runs", "final_pipeline*",
                                   "report.json"))
    reps = []
    for p in sorted(paths, key=os.path.getmtime, reverse=True):
        try:
            with open(p) as f:
                reps.append((p, json.load(f)))
        except Exception:
            continue
    return reps


def _ab_validates(ab, tag):
    """Accuracy gate for promoting a faster configuration to the
    headline: top-1 agreement >= 0.9, or (median rot delta < 1 deg AND a
    bounded per-frame ADD tail — medians alone hid an 86 mm worst-frame
    regression in the rejected 144/16 prune A/B)."""
    if not isinstance(ab, dict):
        return False
    if ab.get("top1_pose_agreement_frac", 0.0) >= 0.9:
        return True
    rot_delta = abs(ab.get(f"rot_deg_{tag}", 1e9)
                    - ab.get("rot_deg_full", 0.0))
    tail = ab.get("add_mm_worst_frame_delta")
    return rot_delta < 1.0 and tail is not None and tail < 5.0


def _load_validation(kind):
    """Newest committed A/B of `kind` ("prune_ab" | "coarse_res_ab" |
    "coarse_small_ab"): returns (ab_dict, validated: bool) or
    (None, False)."""
    for _, rep in _load_ab_reports():
        ab = rep.get(kind)
        if isinstance(ab, dict):
            tag = {"prune_ab": "pruned", "coarse_res_ab": "coarse_res",
                   "coarse_small_ab": "coarse_small",
                   "combo_ab": "combo"}[kind]
            return ab, _ab_validates(ab, tag)
    return None, False


def main():
    """Stage order is budget-aware (VERDICT r4 weak #1: the headline must
    land within the driver's wall-clock cap): the HEADLINE pipeline stage
    runs FIRST, and the accumulating aggregate JSON is printed to stdout
    after EVERY stage, so a cap at any point still leaves a parseable
    final line with the best number measured so far."""
    t_start = time.monotonic()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "2400"))
    result = {
        "metric": ("poses/sec/chip end-to-end "
                   "(coarse 576-grid + 5 refiner iters)"),
        "value": 0.0,
        "unit": "poses/s",
        "vs_baseline": 0.0,
        "baseline_note": (
            "baseline=0.4 poses/s/GPU, DERIVED estimate of the reference "
            "PyTorch+Panda3D pipeline on V100-class hw (see bench.py "
            "docstring); reference publishes no measured numbers"
        ),
        "failed_stages": [],
        "skipped_stages": [],
    }

    def emit():
        result["bench_wall_s"] = round(time.monotonic() - t_start, 1)
        print(json.dumps(result), flush=True)

    def remaining():
        return budget_s - (time.monotonic() - t_start)

    # Accuracy-validated fast-path configuration for the headline stage,
    # composed from the committed demo_finalize_pipeline A/Bs (newest
    # first). Composing LEVERS (small scorer + pruning) needs DIRECT
    # evidence that the combination preserves accuracy — per-lever gates
    # don't guarantee they compose (ADVICE r4 on the prune gate's tail) —
    # so the composed config is only used when combo_ab validates; else
    # fall back to the strongest single validated lever. The best
    # validated config IS the headline and runs FIRST, so a budget cap
    # at any later point still leaves the best number parsed.
    cres_ab, cres_ok = _load_validation("coarse_res_ab")
    cs_ab, cs_ok = _load_validation("coarse_small_ab")
    combo, combo_ok = _load_validation("combo_ab")
    result["coarse_res_ab_validation"] = cres_ab
    result["coarse_small_ab_validation"] = cs_ab
    result["combo_ab_validation"] = combo

    fast = {}  # validated lever kwargs folded into the headline spec
    fast_suffix = ""
    c_in = ([int(x) for x in cs_ab["coarse_input_size"]]
            if cs_ab is not None and cs_ab.get("coarse_input_size")
            else None)
    if (combo_ok and combo.get("coarse_small") and c_in
            and "prune_grid" in combo):
        fast = {"coarse_input": c_in, "prune": int(combo["prune_grid"]),
                "prune_keep": int(combo["prune_keep"])}
        fast_suffix = (f"-cs{c_in[0]}x{c_in[1]}"
                       f"-pruned{fast['prune']}-{fast['prune_keep']}")
        beam_txt = "5"
        if combo.get("top_k"):
            # The combo A/B also validated a shrunk refiner beam.
            fast["beam"] = int(combo["top_k"])
            fast_suffix += f"-beam{fast['beam']}"
            beam_txt = str(fast["beam"])
        result["metric"] = (
            f"poses/sec/chip end-to-end ({c_in[0]}x{c_in[1]}-native "
            f"coarse scorer, hierarchical {fast['prune']}->"
            f"{fast['prune_keep']}-parent coarse over the 576 grid + "
            f"top-{beam_txt} beam x 5 refiner iters at 240x320; "
            "accuracy-validated by the committed combined-config A/B)")
    elif cs_ok and c_in:
        fast = {"coarse_input": c_in}
        fast_suffix = f"-cs{c_in[0]}x{c_in[1]}"
        result["metric"] = (
            f"poses/sec/chip end-to-end ({c_in[0]}x{c_in[1]}-native "
            "coarse scorer over the 576 grid + 5 refiner iters at "
            "240x320; accuracy-validated by the committed coarse_small "
            "A/B)")
    elif cres_ok and cres_ab.get("coarse_render_size"):
        cr = [int(x) for x in cres_ab["coarse_render_size"]]
        fast = {"coarse_res": cr}
        fast_suffix = f"-cres{cr[0]}x{cr[1]}"
        result["metric"] = (
            "poses/sec/chip end-to-end (coarse 576-grid rasterized at "
            f"{cr[0]}x{cr[1]} + 5 refiner iters; accuracy-validated by "
            "the committed coarse_res A/B)")

    # ---- HEADLINE: pipeline D=8, pack=2, best validated config ----
    best_d, best_pack = 8, 2
    headline_spec = {"stage": "pipeline", "D": best_d, "pack": best_pack,
                     "mfu": True,
                     "tag": f"pipeline/D{best_d}-pack{best_pack}"
                            f"{fast_suffix}"}
    headline_spec.update(fast)
    r = run_stage(headline_spec, timeout=1500)
    per_d = {}
    if r:
        result["device"] = r.get("device")
        per_d[f"{best_d}/pack{best_pack}"] = round(r["poses_per_s"], 4)
        result["value"] = round(r["poses_per_s"], 4)
        result["vs_baseline"] = round(
            r["poses_per_s"] / BASELINE_POSES_PER_S, 2)
        result["best_n_detections"] = best_d
        result["best_hyp_pack"] = best_pack
        result["mfu"] = round(r.get("mfu", 0.0), 4)
        result["flops_per_image"] = r.get("flops_per_image")
        result["first_call_s_cold"] = r.get("compile_s")
    else:
        result["failed_stages"].append(headline_spec["tag"])
    result["poses_per_s_by_detections"] = per_d
    emit()

    # ---- phase split + warm cross-process compile for the headline ----
    spec = {"stage": "pipeline", "D": best_d, "pack": best_pack,
            "phases": True,
            "tag": f"phases/D{best_d}-pack{best_pack}{fast_suffix}"}
    spec.update(fast)
    if remaining() > 300:
        r = run_stage(spec, timeout=min(1500, max(300, remaining())))
        if r:
            result["phase_ms"] = r.get("phase_ms")
            result["phased_total_ms"] = r.get("phased_total_ms")
            result["first_call_s_warm"] = r.get("compile_s")
        else:
            result["failed_stages"].append(spec["tag"])
    else:
        result["skipped_stages"].append(spec["tag"])
    emit()

    # ---- full (no-lever) comparison row: the r02-r04 headline config --
    spec = {"stage": "pipeline", "D": best_d, "pack": best_pack,
            "tag": f"pipeline/D{best_d}-pack{best_pack}-full"}
    if fast and remaining() > 300:
        r = run_stage(spec, timeout=min(1200, max(300, remaining())))
        if r:
            result["poses_per_s_full_config"] = round(r["poses_per_s"], 4)
            per_d[f"{best_d}/pack{best_pack}-full"] = round(
                r["poses_per_s"], 4)
        else:
            result["failed_stages"].append(spec["tag"])
    elif fast:
        result["skipped_stages"].append(spec["tag"])
    emit()

    # ---- D=1 row (dispatch-bound single-detection latency) ----
    spec = {"stage": "pipeline", "D": 1, "pack": 1,
            "tag": f"pipeline/D1-pack1{fast_suffix}"}
    spec.update(fast)
    if remaining() > 300:
        r = run_stage(spec, timeout=min(1200, max(300, remaining())))
        if r:
            per_d["1/pack1"] = round(r["poses_per_s"], 4)
        else:
            result["failed_stages"].append(spec["tag"])
    else:
        result["skipped_stages"].append(spec["tag"])
    emit()

    # ---- hypothesis renders/s (pack 2 = the pipeline config) ----
    renders = {}
    # pack-4 is viable again since the face-segment loop became a
    # lax.scan (one Mosaic compile per kernel shape instead of one per
    # segment); measure it after the known-good pack-2 pipeline config.
    for pack in (2, 4, 1):
        tag = f"renders/pack{pack}"
        if remaining() < 240:
            result["skipped_stages"].append(tag)
            continue
        r = run_stage({"stage": "renders", "pack": pack, "tag": tag},
                      timeout=min(900, max(240, remaining())))
        if r:
            renders[pack] = r["renders_per_sec"]
        else:
            result["failed_stages"].append(tag)
        best_pack_r = max(renders, key=renders.get) if renders else 1
        result["renders_per_sec"] = renders.get(best_pack_r, 0.0)
        result["renders_per_sec_by_pack"] = {
            str(k): v for k, v in renders.items()}
        emit()

    # ---- hierarchical pruning row (headline-promoted only when the
    # committed prune A/B validates it; 72/8 was rejected, 144/16
    # validated on the 2500-step scorer — runs/final_pipeline_p144b).
    # Redundant (skipped) when pruning is already in the headline. --
    ab, prune_ok = _load_validation("prune_ab")
    result["prune_ab_validation"] = ab
    if (ab is not None and "prune_grid" in ab and "prune" not in fast
            and remaining() > 300):
        p_grid = int(ab["prune_grid"])
        p_keep = int(ab["prune_keep"])
        tag = f"pruned{p_grid}-{p_keep}/D{best_d}"
        spec = {"stage": "pipeline", "D": best_d, "pack": best_pack,
                "prune": p_grid, "prune_keep": p_keep, "tag": tag}
        if "coarse_res" in fast:
            spec["coarse_res"] = fast["coarse_res"]
        r = run_stage(spec, timeout=min(1200, max(300, remaining())))
        result[f"poses_per_s_pruned_{p_grid}_{p_keep}"] = (
            round(r["poses_per_s"], 4) if r else 0.0)
        if not r:
            result["failed_stages"].append(tag)
        if r and prune_ok and r["poses_per_s"] > result["value"]:
            result["value"] = round(r["poses_per_s"], 4)
            result["vs_baseline"] = round(
                r["poses_per_s"] / BASELINE_POSES_PER_S, 2)
            result["metric"] = (
                f"poses/sec/chip end-to-end (hierarchical {p_grid}->"
                f"{p_keep}-parent coarse over the 576 grid + 5 refiner "
                "iters; accuracy-validated by the committed prune A/B)")
        emit()

    # ---- natively-small coarse scorer row (headline-promoted only when
    # the committed coarse_small_ab A/B validates it: a 120x160 coarse
    # model shrinks the CNN ~4x on the flops_split-dominant stage; the
    # refiner stays at 240x320). Redundant (skipped) when the small
    # scorer is already in the headline. ----
    if c_in and "coarse_input" not in fast and remaining() > 300:
        tag = f"coarse-small{c_in[0]}x{c_in[1]}/D{best_d}"
        spec = {"stage": "pipeline", "D": best_d, "pack": best_pack,
                "coarse_input": c_in, "mfu": True, "tag": tag}
        if (combo_ok and combo.get("coarse_small")
                and "prune_grid" in combo):
            spec["prune"] = int(combo["prune_grid"])
            spec["prune_keep"] = int(combo["prune_keep"])
            tag += f"-pruned{spec['prune']}-{spec['prune_keep']}"
            spec["tag"] = tag
        r = run_stage(spec, timeout=min(1200, max(300, remaining())))
        result["poses_per_s_coarse_small"] = (
            round(r["poses_per_s"], 4) if r else 0.0)
        if not r:
            result["failed_stages"].append(tag)
        promoted_ok = combo_ok if spec.get("prune") else cs_ok
        if r and promoted_ok and r["poses_per_s"] > result["value"]:
            result["value"] = round(r["poses_per_s"], 4)
            result["vs_baseline"] = round(
                r["poses_per_s"] / BASELINE_POSES_PER_S, 2)
            result["mfu"] = round(r.get("mfu", result.get("mfu", 0.0)), 4)
            result["metric"] = (
                f"poses/sec/chip end-to-end ({c_in[0]}x{c_in[1]}-native "
                "coarse scorer over the 576 grid"
                + (f", hierarchical {spec['prune']}->{spec['prune_keep']}"
                   if spec.get("prune") else "")
                + " + 5 refiner iters at 240x320; accuracy-validated by "
                + ("the committed combined-config A/B)" if spec.get("prune")
                   else "the committed coarse_small A/B)"))
        emit()

    # ---- secondary render rows + real-scale pipeline ----
    for spec, key in (
        ({"stage": "renders", "mode": "scan", "n_hyp": 64,
          "tag": "renders/scan"}, "renders_per_sec_scan"),
        ({"stage": "renders", "big": True, "n_hyp": 64,
          "tag": "renders/34k-faces"}, "renders_per_sec_34k_faces"),
        ({"stage": "pipeline", "D": 8, "big": True,
          "tag": "pipeline/real-scale-34k"},
         "poses_per_s_real_scale_34k_faces"),
    ):
        if remaining() < 300:
            result["skipped_stages"].append(spec["tag"])
            continue
        r = run_stage(spec, timeout=min(1200, max(300, remaining())))
        val = r.get("renders_per_sec", r.get("poses_per_s")) if r else 0.0
        result[key] = round(val, 4) if r else 0.0
        if not r:
            result["failed_stages"].append(spec["tag"])
        emit()

    # ---- D=16 row, LAST (amortization scaling past the headline
    # config; a cold D=16 Mosaic compile can be slow, so it must not
    # displace any established row) ----
    spec = {"stage": "pipeline", "D": 16, "pack": best_pack,
            "tag": f"pipeline/D16-pack{best_pack}{fast_suffix}"}
    spec.update(fast)
    if remaining() > 300:
        r = run_stage(spec, timeout=min(1200, max(300, remaining())))
        if r:
            per_d[f"16/pack{best_pack}"] = round(r["poses_per_s"], 4)
            result["poses_per_s_by_detections"] = per_d
            # Throughput, not latency, is the headline: promote D=16
            # when it beats the D=8 number under the same validated
            # config.
            if r["poses_per_s"] > result["value"]:
                result["value"] = round(r["poses_per_s"], 4)
                result["vs_baseline"] = round(
                    result["value"] / BASELINE_POSES_PER_S, 2)
                result["best_n_detections"] = 16
        else:
            result["failed_stages"].append(spec["tag"])
    else:
        result["skipped_stages"].append(spec["tag"])
    emit()


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        spec = json.loads(sys.argv[2])
        out = run_worker(spec)
        print(RESULT_MARK + json.dumps(out), flush=True)
    else:
        main()
