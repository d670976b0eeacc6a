"""Persistent XLA compilation cache, on by default for every entry point.

On this environment's remote-compile backend a fresh process pays minutes
of compiles before the first real step (a trivial jitted matmul measured
235 s cold vs 11 s with a warm cache); on any TPU, full-size prefill/decode
programs cost 20-40 s each per process. The JAX persistent cache keys on
(HLO, compiler version, device kind), so enabling it is semantics-free.

Opt out / relocate with ``LSS_COMPILE_CACHE`` (``0``/``off`` disables, any
other value is the cache directory; default ``~/.cache/lss_jax_cache``).
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> bool:
    """Idempotently point JAX at the persistent compilation cache.

    Must run before the first compilation (any time before first jitted
    call is fine). Returns True iff the cache is enabled.
    """
    env = os.environ.get("LSS_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "false", "none"):
        return False
    cache_dir = env or os.path.join(
        os.path.expanduser("~"), ".cache", "lss_jax_cache"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # default threshold skips sub-second compiles; 1 s keeps the cache
        # small while capturing everything that actually hurts
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:  # noqa: BLE001 — never let caching break an entry point
        return False
