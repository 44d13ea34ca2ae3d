"""Resource probes (device memory, host RSS).

Re-design of the reference's `utils/resources.py:42-64` (cuda max-mem,
nvidia-smi XML, psutil PSS) for TPU: `device.memory_stats()` + /proc.
"""

from __future__ import annotations

import jax


def device_memory_stats(device=None) -> dict:
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
    except (RuntimeError, AttributeError, NotImplementedError):
        stats = {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }


def host_memory_rss_mb() -> float:
    try:
        with open("/proc/self/status") as fh:
            for line in fh:
                if line.startswith("VmRSS:"):
                    return float(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def assert_memory_below(fraction: float = 0.95) -> None:
    s = device_memory_stats()
    if s["bytes_limit"]:
        used = s["bytes_in_use"] / s["bytes_limit"]
        assert used < fraction, f"device memory {used:.1%} >= {fraction:.0%}"
