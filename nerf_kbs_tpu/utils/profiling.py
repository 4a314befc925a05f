"""Profiling/observability: jax.profiler trace harness, step timers with
rays/sec counters, and the SIGUSR1 stack-dump hook.

The reference's observability is nerfstudio's step timers + viewer writers
and a faulthandler SIGUSR1 hook for hang diagnosis
(/root/reference/train.py:1-2,104; SURVEY §5 maps the TPU equivalents to
jax.profiler + block_until_ready timing)."""

from __future__ import annotations

import contextlib
import faulthandler
import signal
import time
from typing import Optional

import jax


def install_faulthandler() -> None:
    """SIGUSR1 dumps all thread stacks (reference train.py:104)."""
    try:
        faulthandler.register(signal.SIGUSR1)
    except (AttributeError, ValueError):  # platform without SIGUSR1 / non-main thread
        faulthandler.enable()


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/nkt_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with rays/sec; synchronizes on a representative
    output to measure real device time."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._rays = 0
        self._steps = 0

    def tick(self, rays: int, sync_on=None):
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self._rays += rays
        self._steps += 1

    def rates(self) -> dict:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return {
            "steps_per_sec": self._steps / dt,
            "rays_per_sec": self._rays / dt,
            "elapsed_s": dt,
        }


def device_memory_stats() -> Optional[dict]:
    """Live/peak HBM byte counters when the backend exposes them."""
    try:
        stats = jax.local_devices()[0].memory_stats()
    except (RuntimeError, AttributeError):
        return None
    if not stats:
        return None
    keys = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
    return {k: stats[k] for k in keys if k in stats}
