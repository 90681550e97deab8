"""Persistent XLA compilation cache.

First compiles through the axon relay cost 30-200+ s per jitted graph (the
stft train step measured 226 s); jax's persistent cache serializes compiled
executables to disk so repeat runs — restarts, adapt jobs, serving process
churn — skip the compile entirely. Verified working through the relay
(.runs cache probe, 2026-08-21): the executable round-trips and a second
process loads it.

Enabled by default for the training loop, the serving engine, and bench;
`VITS_TPU_JIT_CACHE=0` disables, `VITS_TPU_JIT_CACHE=<dir>` overrides the
location (default ~/.cache/vits_tpu_jit).

Reference analog: torch's CUDA/TorchScript kernel caches are implicit; this
makes the equivalent explicit for XLA.
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Idempotently point jax at a persistent compilation cache directory.

    Returns the directory in effect, or None when disabled."""
    global _enabled
    env = os.environ.get("VITS_TPU_JIT_CACHE", "")
    if env in ("0", "false", "off"):
        return None
    if _enabled:
        return _enabled
    if env and env not in ("1", "true", "on"):
        path = env
    if path is None:
        path = os.path.join(os.path.expanduser("~"), ".cache", "vits_tpu_jit")
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took meaningful compile time; tiny graphs
        # recompile faster than they deserialize
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    _enabled = path
    return path
