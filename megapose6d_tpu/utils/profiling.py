"""Profiling helpers: xprof traces + named-phase annotation.

The TPU analog of the reference's hand-rolled CUDA-event timing
(SURVEY.md §5.1; training/utils.py:224-264): `jax.profiler` captures full
device traces for xprof/tensorboard, `annotate` names pipeline phases in
the trace, and `DeviceTimer` (utils/timers.py) covers quick wall-clock
fencing.
"""

from __future__ import annotations

import contextlib
from pathlib import Path


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """Capture a device trace viewable in xprof/tensorboard:

        with profiling.trace("/tmp/trace"):
            estimator.run_inference_pipeline(obs, detections)
    """
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (also usable as a decorator)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
