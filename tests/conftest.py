"""Test configuration: force a deterministic 8-virtual-device CPU backend.

Multi-chip sharding is exercised on a virtual CPU mesh (the "fake backend"
the reference lacks, SURVEY §4); numerical parity vs torch is done in
float32 with HIGHEST matmul precision.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
# XLA's in-process collective rendezvous ABORTS the process when any of the
# 8 virtual-device threads is >40 s late — easily tripped by a sharded
# trainer graph on this 1-core host when anything else shares the core.
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    flags = flags + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) pins jax_platforms to "axon,cpu";
# force the CPU backend for tests — deterministic float32 parity vs torch
# and a true 8-virtual-device mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compile cache: the trainer-step graphs take minutes to build on
# CPU XLA; repeat suite runs hit the cache and finish in ~2 min
from academicodec_tpu.utils.xla_cache import enable_persistent_cache
enable_persistent_cache()

import sys  # noqa: E402

REFERENCE_ROOT = "/root/reference"
if os.path.isdir(REFERENCE_ROOT) and REFERENCE_ROOT not in sys.path:
    # makes `import academicodec` (the torch reference) available for
    # golden-parity tests; guarded so tests degrade gracefully elsewhere
    sys.path.insert(0, REFERENCE_ROOT)

import pytest  # noqa: E402


def has_reference():
    try:
        import academicodec  # noqa: F401

        return True
    except Exception:
        return False


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="torch reference implementation not available"
)


def reinvoke_isolated(test_file: str, test_name: str, env_key: str) -> bool:
    """Subprocess-isolation helper for big-graph compiles (CLAUDE.md):
    compiling a large XLA:CPU graph late in a long pytest process can
    segfault inside the compiler / compilation-cache serialization
    (state-dependent upstream crash; the identical test passes in any
    fresh process). Returns True when the caller IS the isolated inner
    process and should run the test body; otherwise re-invokes the single
    test in a fresh subprocess, asserts success, and returns False."""
    import subprocess

    if os.environ.get(env_key) == "1":
        return True
    env = {**os.environ, env_key: "1"}
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-x",
         test_file + "::" + test_name],
        env=env, capture_output=True, text=True, timeout=3000,
    )
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-1500:])
    return False
