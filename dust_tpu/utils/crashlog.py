"""Crash telemetry: the analog of the sentry crate.

Reference: ``crates/sentry`` (SURVEY §2.8, §5.3) — sentry SDK init, GPU
context enrichment, a DEVICE_LOST hook that captures an Aftermath GPU
crash dump and exits. Here: an excepthook that writes a crash report
(exception, device/platform context, engine config, recent log records)
to a local file — no network, no SDK.
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import sys
import traceback

__all__ = ["install", "capture"]

_context: dict = {}
_LOG_RING: list[str] = []
_MAX_LOGS = 200


class _RingHandler(logging.Handler):
    def emit(self, record):
        _LOG_RING.append(self.format(record))
        del _LOG_RING[:-_MAX_LOGS]


def _device_context() -> dict:
    """GPU-context enrichment analog (sentry/src/lib.rs:100-190)."""
    try:
        import jax

        devs = jax.devices()
        return {
            "backend": jax.default_backend(),
            "devices": [
                {"kind": d.device_kind, "platform": d.platform, "id": d.id}
                for d in devs
            ],
            "jax_version": jax.__version__,
        }
    except Exception as e:  # device lost / backend init failure
        return {"error": repr(e)}


def capture(exc_type=None, exc=None, tb=None, extra: dict | None = None,
            directory: str = "/tmp") -> str:
    """Write a crash report; returns the file path."""
    report = {
        "timestamp": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        "exception": "".join(
            traceback.format_exception(exc_type, exc, tb)
        ) if exc_type else None,
        "device": _device_context(),
        "context": dict(_context, **(extra or {})),
        "recent_logs": list(_LOG_RING),
        "argv": sys.argv,
        "pid": os.getpid(),
    }
    path = os.path.join(
        directory, f"dust_tpu_crash_{os.getpid()}_{int(datetime.datetime.now().timestamp())}.json"
    )
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    return path


def install(context: dict | None = None, directory: str = "/tmp") -> None:
    """Install the excepthook + log capture (SentryPlugin analog)."""
    _context.update(context or {})
    handler = _RingHandler()
    handler.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s"))
    logging.getLogger().addHandler(handler)

    prev = sys.excepthook

    def hook(exc_type, exc, tb):
        try:
            path = capture(exc_type, exc, tb, directory=directory)
            print(f"[dust_tpu] crash report written to {path}", file=sys.stderr)
        finally:
            prev(exc_type, exc, tb)

    sys.excepthook = hook
