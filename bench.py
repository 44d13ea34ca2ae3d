"""Benchmark harness — prints ONE JSON line with the north-star metric.

Metric (BASELINE.json): poses/sec/chip end-to-end (coarse scoring of the
full 576-rotation SO(3) grid + top-K selection + 5 refiner iterations +
re-scoring), plus hypothesis renders/sec as a secondary key.

Runs on whatever jax.devices()[0] is (the real TPU chip under the driver;
CPU elsewhere). No reference baseline numbers exist (the reference repo
publishes none — BASELINE.md), so vs_baseline is reported as null until a
measured PyTorch+Panda3D baseline lands.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_world():
    from megapose6d_tpu.meshes import (
        MeshDataBase,
        RigidObject,
        RigidObjectDataset,
        make_cube,
        make_uv_sphere,
    )

    # BOP-scale procedural meshes (~3k faces after padding).
    objs = RigidObjectDataset(
        [
            RigidObject(label="obj1", mesh=make_uv_sphere(0.05, 40, 40)),
            RigidObject(label="obj2", mesh=make_cube(0.04)),
        ]
    )
    db = MeshDataBase.from_object_ds(
        objs, max_faces=3200, n_points=1000, n_sym=8
    )
    return db.batched(align=128)


def bench_renders(mesh_db, n_hyp=64, iters=5, resolution=(240, 320), mode="tiled"):
    from megapose6d_tpu.ops import rasterizer
    from megapose6d_tpu.ops.rasterizer_tiled import render_meshes_tiled

    idx = jnp.zeros((n_hyp,), jnp.int32)
    meshes = mesh_db.select(idx)
    from megapose6d_tpu.ops.so3_grid import make_so3_grid
    from megapose6d_tpu.ops.se3 import make_se3

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


def bench_pipeline(mesh_db):
    from megapose6d_tpu.data import ObservationTensor
    from megapose6d_tpu.inference import (
        InferenceConfig,
        PoseEstimator,
        make_detections,
    )
    from megapose6d_tpu.models import (
        PosePredictor,
        make_coarse_config,
        make_refiner_config,
    )
    from megapose6d_tpu.ops import rasterizer

    render = (240, 320)
    img_res = (480, 640)
    dtype = "bfloat16" if jax.devices()[0].platform != "cpu" else "float32"

    coarse = PosePredictor(
        make_coarse_config(render_size=render, face_chunk=128, compute_dtype=dtype)
    )
    refiner = PosePredictor(
        make_refiner_config(
            render_size=render, face_chunk=128, compute_dtype=dtype
        )
    )

    K = np.asarray([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]], np.float32)
    TCO_gt = np.eye(4, dtype=np.float32)
    TCO_gt[2, 3] = 0.55
    meshes1 = mesh_db.select(jnp.zeros((1,), jnp.int32))
    obs_r = rasterizer.render_meshes(
        meshes1.vertices, meshes1.normals, meshes1.colors, meshes1.faces,
        meshes1.face_valid, jnp.asarray(TCO_gt)[None], jnp.asarray(K)[None],
        img_res, chunk=128, light_ambient=1.0, light_point=0.0,
    )
    obs = ObservationTensor(images=np.asarray(obs_r.rgb), K=K[None])

    imgs = jnp.zeros((1,) + img_res + (3,), jnp.float32)
    T0 = jnp.asarray(TCO_gt)[None]
    cparams = coarse.init(
        jax.random.PRNGKey(0), imgs, jnp.asarray(K)[None], T0, meshes1
    )
    rparams = refiner.init(
        jax.random.PRNGKey(1), imgs, jnp.asarray(K)[None], T0, meshes1
    )

    cfg = InferenceConfig(
        SO3_grid_size=576,
        n_refiner_iterations=5,
        n_pose_hypotheses=5,
        bsz_images=64,
        bsz_objects=8,
        max_detections=1,
        fused_pipeline=True,
    )
    est = PoseEstimator(coarse, cparams, refiner, rparams, mesh_db, cfg)

    half = 600 * 0.05 / 0.5
    box = np.asarray(
        [[320 - half, 240 - half, 320 + half, 240 + half]], np.float32
    )
    detections = make_detections(["obj1"], box)

    log("compiling pipeline (first call)...")
    t0 = time.monotonic()
    est.run_inference_pipeline(obs, detections)
    log(f"first call (incl. compile): {time.monotonic() - t0:.1f}s")

    iters = 3
    t0 = time.monotonic()
    for _ in range(iters):
        out, extra = est.run_inference_pipeline(obs, detections)
    dt = (time.monotonic() - t0) / iters
    log(f"steady-state pipeline: {dt*1000:.0f} ms/detection; phases: "
        f"{ {k: round(v*1000) for k, v in est.timing_.items()} } ms")
    return 1.0 / dt, est.timing_


def main():
    log(f"devices: {jax.devices()}")
    mesh_db = build_world()
    renders_tiled = bench_renders(mesh_db, mode="tiled")
    log(f"tiled renders/sec (240x320, ~3k faces): {renders_tiled:.1f}")
    renders_scan = bench_renders(mesh_db, mode="scan")
    log(f"scan renders/sec: {renders_scan:.1f}")
    poses_per_s, timing = bench_pipeline(mesh_db)
    result = {
        "metric": "poses/sec/chip end-to-end (coarse 576-grid + 5 refiner iters)",
        "value": round(poses_per_s, 4),
        "unit": "poses/s",
        "vs_baseline": None,
        "renders_per_sec": round(renders_tiled, 1),
        "renders_per_sec_scan": round(renders_scan, 1),
        "phase_ms": {k: round(v * 1000, 1) for k, v in timing.items()},
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
