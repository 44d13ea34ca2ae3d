"""Timers: wall clock + device-synchronized (the CudaTimer analog).

Re-design of the reference's `utils/timer.py:7-37` and the cuda-event
`CudaTimer` (training/utils.py:224-264): on TPU the analog of event timing
is `block_until_ready()` fencing; for in-depth traces use `jax.profiler`.
"""

from __future__ import annotations

import time


class Timer:
    """Pausable wall-clock timer (utils/timer.py:7-37)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.elapsed = 0.0
        self._start = None
        return self

    def start(self):
        self._start = time.monotonic()
        return self

    def pause(self):
        if self._start is not None:
            self.elapsed += time.monotonic() - self._start
            self._start = None
        return self

    def resume(self):
        return self.start()

    def stop(self) -> float:
        self.pause()
        return self.elapsed


class DeviceTimer:
    """Times device work by fencing with block_until_ready
    (CudaTimer analog, training/utils.py:224-264)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.elapsed_ = 0.0
        self._t0 = None

    def start(self):
        if self.enabled:
            import jax

            jax.effects_barrier()
            self._t0 = time.monotonic()

    def end(self, *outputs):
        if self.enabled and self._t0 is not None:
            for out in outputs:
                try:
                    out.block_until_ready()
                except AttributeError:
                    pass
            self.elapsed_ = time.monotonic() - self._t0

    def elapsed(self) -> float:
        return self.elapsed_
