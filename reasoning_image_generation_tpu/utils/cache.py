# cache.py — persistent XLA compilation cache, on by default.
"""The per-leaf pipeline programs cost minutes each on this environment's
remote compile service; the persistent cache makes any previously-compiled
program load in seconds.  Both generators enable it at construction so
library users get warm cold-starts without knowing the knob exists (the
CLI enables it even earlier, before backend init)."""
from __future__ import annotations

import os

_enabled = False


def cache_dir() -> str:
    return os.path.expanduser("~/.cache/rig_tpu_xla")


def enable_compilation_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", path or cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception:
        pass


def load_run_stats(name: str) -> dict:
    """Persisted transfer-tier statistics (largest run count per packed
    tensor, io/transfer.py::transfer_tier).  Stats persist next to the
    compilation cache so a fresh process starts with converged tiers —
    batch 1 of every run transfers tight buffers and never compiles a new
    tier shape mid-run."""
    import json
    try:
        with open(os.path.join(cache_dir(), f"runstats_{name}.json"),
                  encoding="utf-8") as f:
            data = json.load(f)
        # floats, not int(): rle3 stats are per-frame AVERAGES; truncation
        # would restart persisted tiers slightly below the observed value
        # (the silent-bias family that caused the escape-burst cascade)
        return {str(k): float(v) for k, v in data.items()}
    except Exception:
        return {}


def save_run_stats(name: str, stats: dict) -> None:
    """Max-merge `stats` into the persisted file (atomic replace)."""
    import json
    if not stats:
        return
    try:
        merged = load_run_stats(name)
        for k, v in stats.items():
            merged[k] = max(float(v), merged.get(k, 0.0))
        os.makedirs(cache_dir(), exist_ok=True)
        path = os.path.join(cache_dir(), f"runstats_{name}.json")
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(merged, f)
        os.replace(tmp, path)
    except Exception:
        pass
