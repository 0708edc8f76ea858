"""Persistent XLA compilation cache (best effort).

On the remote-attached TPU, a single program compile costs ~12-25 s and the
GAN-DES audio path compiles one render + one mel program per pow2
length bucket — several minutes of one-time work PER PROCESS without a
persistent cache. Enabling jax's compilation cache cuts warm process
startup to ~1 s/program (verified on this relay). Entries are keyed by
platform/flags/program, so CPU test runs and TPU runs coexist safely.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/gandes_tpu/jax")


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point jax at a persistent on-disk compilation cache. Returns the
    cache path, or None when unavailable (older jax, read-only fs) — always
    safe to call."""
    import jax

    path = path or os.environ.get("GANDES_JAX_CACHE", _DEFAULT)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return path
    except Exception:
        return None
