"""Host-fingerprinted persistent XLA compilation-cache directories.

The JAX persistent compilation cache stores serialized *executables*. For
the CPU backend that is XLA:CPU AOT machine code specialized to the host
CPU that compiled it, and the cache key does NOT include that host's
feature set. This VM can live-migrate between physical machines
mid-session with uptime preserved (observed: a host with
``+prefer-no-scatter/+prefer-no-gather`` tuning -> a generic Intel Xeon).
After a migration, a stale entry still *loads* — ``cpu_aot_loader`` only
logs an E-level "machine features don't match ... could lead to execution
errors such as SIGILL" — and then SIGABRTs inside the Eigen thread pool
when executed. ``tests/multihost_worker.py`` had already isolated its
explicitly-AOT executables for exactly this reason; the migration makes
every ordinarily-jitted CPU entry just as dangerous.

Appending a host-CPU fingerprint (model name + flags) to every cache
directory turns a migration into a cold cache instead of a crash. TPU
(axon) executables are device code and would survive a host swap, but they
share directories with CPU entries, so the fingerprint applies everywhere
— the cost is one re-compile pass per (new host, graph).

KNOWN BENIGN WARNING: every cross-process AOT cache *hit* — same host,
no migration — still logs ``cpu_aot_loader`` E-level mismatches naming
exactly ``+prefer-no-scatter``/``+prefer-no-gather``. Those are tuning
preferences XLA appends to the compile-time feature string; the loader's
host probe (raw LLVM ``getHostCPUFeatures``) never reports them, so the
set comparison always flags them. Verified by diffing the embedded
feature strings of a stale blob vs a fresh same-host compile: identical
ISA sets. A *real* migration shows ISA-bit deltas (avx512*, amx-*) in the
same log line — that is the fatal case this module guards against.
"""

from __future__ import annotations

import hashlib


def host_cpu_fingerprint() -> str:
    """Stable short hash of this host's CPU identity (model name + flags).

    Volatile /proc/cpuinfo fields (MHz, bogomips) are excluded so the
    fingerprint survives frequency scaling; distinct CPU models that XLA
    tunes differently (e.g. prefer-no-gather on Zen) differ in model name.
    """
    model = flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not model and line.startswith("model name"):
                    model = line.strip()
                elif not flags and line.startswith("flags"):
                    flags = line.strip()
                if model and flags:
                    break
    except OSError:
        return "unknown-host"
    return hashlib.sha1(f"{model}\n{flags}".encode()).hexdigest()[:10]


def cache_dir(base: str) -> str:
    """Fingerprinted cache path for ``base`` (no filesystem side effects)."""
    return f"{base}-{host_cpu_fingerprint()}"


def enable_persistent_cache(
    base: str = "/tmp/academicodec_tpu_xla_cache",
    min_compile_secs: float = 4.0,
) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir(base)``.

    Returns the directory on success, None if the config update failed
    (caching is an optimization only — never fail the caller).
    """
    import jax

    path = cache_dir(base)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
    except Exception:
        return None
    return path
