# utils/backend.py — fail-fast backend detection.
"""Watchdog-bounded ``jax.devices()``.

On this environment's tunneled TPU backend ('axon'), a dead relay process
makes backend initialization block forever in its connection-retry loop —
a bare ``jax.devices()`` call hangs with no timeout and no message (the
round-3 failure mode: every CLI invocation and bench run wedged).  The
library's renderer auto-detection goes through here instead so a dead
relay produces a fast, actionable error.

The probe runs in a daemon thread with a bounded join: on success the
backend is initialized in-process exactly as a direct call would have
done (no subprocess overhead on the happy path); on timeout the hung
thread is abandoned and a RuntimeError tells the user to either restore
the relay or set JAX_PLATFORMS=cpu.
"""
from __future__ import annotations

import os
import threading

_TIMEOUT_S = float(os.environ.get("RIG_BACKEND_TIMEOUT_S", "120"))

_cache: dict = {}
_lock = threading.Lock()


def apply_platform_env() -> None:
    """Mirror the JAX_PLATFORMS env var into jax.config.

    The axon TPU plugin in this image registers itself regardless of
    JAX_PLATFORMS, so the env var alone is silently ignored — a user
    running ``JAX_PLATFORMS=cpu python -m ...cli`` on a dead relay would
    still hang in TPU backend init.  The config API, applied before any
    backend initialization, does win; the CLIs call this first."""
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax
    try:
        jax.config.update("jax_platforms", want)
    except Exception:
        pass  # backend already initialized; nothing to rescue


def devices_or_raise(timeout_s: float | None = None):
    """jax.devices(), but bounded: raises RuntimeError instead of hanging
    forever when the accelerator backend cannot initialize."""
    if "devices" in _cache:
        return _cache["devices"]
    timeout_s = _TIMEOUT_S if timeout_s is None else timeout_s
    apply_platform_env()  # the axon plugin ignores the env-var form
    import jax
    with _lock:
        if "devices" in _cache:
            return _cache["devices"]
        out: list = []
        err: list = []

        def probe():
            try:
                out.append(jax.devices())
            except Exception as e:  # backend init error — report, not hang
                err.append(e)

        t = threading.Thread(target=probe, daemon=True,
                             name="rig-backend-probe")
        t.start()
        t.join(timeout_s)
        if t.is_alive():
            raise RuntimeError(
                f"jax backend initialization did not return within "
                f"{timeout_s:.0f}s — the TPU relay is likely dead or "
                "unreachable.  Restore the relay, or set JAX_PLATFORMS=cpu "
                "to run on the CPU backend.")
        if err:
            raise RuntimeError(
                f"jax backend initialization failed: {err[0]}") from err[0]
        _cache["devices"] = out[0]
        return out[0]


def detect_platform(timeout_s: float | None = None) -> str:
    """'tpu' | 'cpu' | 'gpu' for the default backend, fail-fast."""
    d = devices_or_raise(timeout_s)[0]
    plat = d.platform.lower()
    if plat in ("tpu", "axon") or "tpu" in str(d).lower():
        return "tpu"
    return plat
