"""Per-step wall-time and device-memory tracking.

TPU analog of the reference's ``LogResource`` (``psvi/inference/
utils.py:1752-1781``): average step time and accelerator memory are
accumulated over a run and reported in the results dict
(``avg_epoch_time``, ``gpu_memory`` keys kept for schema parity).
"""

from __future__ import annotations

import time

import jax


def device_memory_bytes() -> float:
    """Allocated bytes on the default device, if the backend reports them."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            return float(stats.get("bytes_in_use", 0))
    except Exception:
        pass
    return 0.0


class LogResource:
    def __init__(self):
        self.time_data = []
        self.memory_data = []
        self.prev_time = time.time()

    def update(self):
        now = time.time()
        self.time_data.append(now - self.prev_time)
        self.prev_time = now
        self.memory_data.append(device_memory_bytes() / 2**20)  # MiB

    def get_resources(self):
        n = max(len(self.time_data), 1)
        return {
            "time": sum(self.time_data) / n,
            "memory": sum(self.memory_data) / n,
        }
