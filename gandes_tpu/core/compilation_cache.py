"""Persistent XLA compilation cache — OPT-IN ONLY on this platform.

Measured trap on the 'axon' (experimental, relay-attached) TPU backend:
executables loaded from jax's persistent compilation cache run
catastrophically slower than freshly compiled ones (the synth render:
0.3 ms fresh vs 1.36 s deserialized — ~4500x), silently poisoning every
subsequent process. Until the backend serializes executables faithfully,
the cache must stay off by default; compile cost is instead bounded by
design (single fixed-length render program, capped mel bucket space).

Set ``GANDES_JAX_CACHE=/path`` to opt in (e.g. on a real Cloud TPU runtime
where the cache behaves).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Enable jax's persistent compilation cache IFF explicitly requested
    via ``path`` or the ``GANDES_JAX_CACHE`` env var. Returns the cache path
    when enabled, else None. Safe to call anywhere."""
    path = path or os.environ.get("GANDES_JAX_CACHE")
    if not path:
        return None
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return path
    except Exception:
        return None
