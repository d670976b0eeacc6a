"""Persistent XLA compilation cache, on by default for every entry point.

On this environment's remote-compile backend a fresh process pays minutes
of compiles before the first real step (a trivial jitted matmul measured
235 s cold vs 11 s with a warm cache); on any TPU, full-size prefill/decode
programs cost 20-40 s each per process. The JAX persistent cache keys on
(HLO, compiler version, device kind), so enabling it is semantics-free.

Opt out / relocate with ``LSS_COMPILE_CACHE`` (``0``/``off`` disables, any
other value is the cache directory; default ``~/.cache/lss_jax_cache``).

The cache directory is partitioned per host-CPU fingerprint
(``host_cpu_fingerprint``): XLA:CPU serialized executables are AOT-compiled
for the build host's exact feature set and can SIGILL on another machine
(observed as round-2 "machine type doesn't match" loader errors when one
cache crossed hosts). Note: XLA:CPU still logs a benign two-line
"+prefer-no-scatter/+prefer-no-gather not supported" warning on every
SAME-host warm load — those are XLA-internal scheduling pseudo-features
appended to the compile-feature list that the host-feature probe never
reports, so the warning fires even when compile and execution host are
identical (verified by compiling into a fresh cache and reloading on the
same machine). Real cross-host mismatches are now impossible by
construction; the residual warning is upstream log noise.
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_cpu_fingerprint() -> str:
    """Short stable fingerprint of this host's CPU feature set.

    JAX's persistent-cache key covers (HLO, compiler version, device kind)
    but NOT the host CPU's microarchitectural features — XLA:CPU AOT
    artifacts compiled on one machine can SIGILL on another (observed as
    "Machine type used for XLA:CPU compilation doesn't match" loader
    errors when the round-2 cache crossed hosts). Partitioning the cache
    directory by machine arch + cpuinfo flags makes cross-host reuse
    impossible by construction; TPU program caches key the same way, which
    only costs a recompile when the HOST changes (rare, and correct).
    """
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line.split(":", 1)[1]
                    break
    except OSError:
        flags = platform.processor()
    digest = hashlib.sha256(
        f"{platform.machine()}|{flags}".encode()
    ).hexdigest()[:12]
    return f"{platform.machine()}-{digest}"


def apply_platform_env() -> None:
    """Honor ``LSS_PLATFORM`` (e.g. ``cpu``) for CLI entry points.

    This environment's sitecustomize imports jax and pins
    ``JAX_PLATFORMS`` before any user code runs, so the standard env var
    never sticks; ``jax.config.update("jax_platforms", ...)`` before first
    backend use is the only switch that works (tests/conftest.py does the
    same for the suite). ``LSS_PLATFORM=cpu`` plus
    ``XLA_FLAGS=--xla_force_host_platform_device_count=8`` drives any CLI
    on the virtual 8-device CPU mesh. No-op once a backend exists."""
    plat = os.environ.get("LSS_PLATFORM", "")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:  # noqa: BLE001 — backends already initialized
        pass


def enable_compilation_cache() -> bool:
    """Idempotently point JAX at the persistent compilation cache.

    Must run before the first compilation (any time before first jitted
    call is fine). Returns True iff the cache is enabled. Also applies
    ``LSS_PLATFORM`` (``apply_platform_env``) so every entry point honors
    the platform override without its own bootstrap.
    """
    apply_platform_env()
    env = os.environ.get("LSS_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "false", "none"):
        return False
    base_dir = env or os.path.join(
        os.path.expanduser("~"), ".cache", "lss_jax_cache"
    )
    # per-host-CPU partition (see host_cpu_fingerprint)
    cache_dir = os.path.join(base_dir, host_cpu_fingerprint())
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
