"""Persistent XLA compilation cache for the inference/training CLIs.

The fused single-program pipeline costs 60-100 s to compile per
(max_detections, image-shape, grid-size) variant on a v5e (BENCH r2/r3
tails). Two design decisions bound that cost:

1. Shapes are deliberately static cache keys: detections are padded to
   `InferenceConfig.max_detections` (inference/pose_estimator.py
   `_pad_to`), so a BOP eval sweeping 1..N detections per image compiles
   ONE program per configured maximum, not one per count.
2. This module turns on JAX's persistent compilation cache, so later
   processes (eval sweeps, cron re-runs, multi-segment training) load
   the compiled executable from disk instead of recompiling.

The reference has no analog — its Panda3D farm pays process-spawn +
scene-graph build per worker instead (panda3d_batch_renderer.py:217-282).

Measured cross-process behavior on the v5e tunnel (round 4): the fused
pipeline's cold compile is ~190 s; a warm cross-process first call was
measured at 16.5 s. The warm hit is NOT reliable for programs containing
Mosaic (Pallas) kernels: with byte-identical source, separate processes
were observed to produce BOTH cache hits and misses. A round-4
investigation pinned the instability to the cache key of the Pallas
custom call (plain XLA programs key deterministically across processes;
the suspect is per-process content in the Mosaic custom-call backend
config), root cause still open. Within-process caching (jit) and the
static-shape policy above are unaffected; bench.py records
`first_call_s_cold` / `first_call_s_warm` so every driver run documents
the empirical amortization.
"""

from __future__ import annotations

import os
from pathlib import Path

_ENV_VAR = "MEGAPOSE_TPU_COMPILE_CACHE"
_enabled = False


def enable_persistent_compilation_cache(
    cache_dir: str | os.PathLike | None = None,
    min_compile_time_secs: float = 2.0,
) -> Path | None:
    """Idempotently enable JAX's on-disk compilation cache.

    Args:
      cache_dir: cache location; defaults to `$MEGAPOSE_TPU_COMPILE_CACHE`
        or `~/.cache/megapose6d_tpu/xla`. Pass the same dir across
        processes to share compiles.
      min_compile_time_secs: only persist compiles slower than this
        (keeps tiny kernels out of the cache).

    Returns the cache path, or None if the jax version lacks the config.
    """
    global _enabled
    import jax

    path = Path(
        cache_dir
        or os.environ.get(_ENV_VAR, "~/.cache/megapose6d_tpu/xla")
    ).expanduser()
    if _enabled:
        return path
    try:
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(min_compile_time_secs),
        )
    except (AttributeError, ValueError, OSError):
        return None
    _enabled = True
    return path
