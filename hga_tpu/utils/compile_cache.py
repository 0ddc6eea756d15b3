"""Persistent XLA compilation cache (SURVEY.md §6 environment notes).

Remote/tunneled TPU compiles cost minutes and the in-memory jit cache dies
with the process; JAX's persistent compilation cache keeps compiled
executables on disk so every pipeline stage (and every re-run / resumed
run) pays each program's compile exactly once per machine.

Called by the CLI entry and the scale harness; HGA_JAX_CACHE=0 disables,
HGA_JAX_CACHE=<dir> overrides the location.
"""

from __future__ import annotations

import os


def enable_compile_cache() -> str | None:
    """Turn on jax_compilation_cache_dir (idempotent).  Returns the dir."""
    env = os.environ.get("HGA_JAX_CACHE", "")
    if env == "0":
        return None
    cache = env or os.path.expanduser("~/.cache/hga_tpu_jax")
    try:
        import jax

        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        return None
    return cache
