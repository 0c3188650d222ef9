"""Host-fingerprinted XLA cache dirs (utils/xla_cache.py).

The persistent cache stores host-specialized CPU machine code; after the VM
live-migrates between physical hosts, stale entries load with only an
E-level feature-mismatch log and SIGABRT at execution (observed round 3).
These tests pin the helper every cache user routes through.
"""

import re

import jax

from academicodec_tpu.utils.xla_cache import (
    cache_dir,
    enable_persistent_cache,
    host_cpu_fingerprint,
)


def test_fingerprint_stable_and_short():
    fp = host_cpu_fingerprint()
    assert fp == host_cpu_fingerprint()
    assert re.fullmatch(r"[0-9a-f]{10}|unknown-host", fp)


def test_cache_dir_composition():
    assert cache_dir("/tmp/base") == f"/tmp/base-{host_cpu_fingerprint()}"


def test_enable_sets_fingerprinted_dir_and_restores():
    before = jax.config.jax_compilation_cache_dir
    try:
        path = enable_persistent_cache("/tmp/academicodec_tpu_xla_cache_testonly")
        assert path == cache_dir("/tmp/academicodec_tpu_xla_cache_testonly")
        assert jax.config.jax_compilation_cache_dir == path
    finally:
        jax.config.update("jax_compilation_cache_dir", before)
    assert jax.config.jax_compilation_cache_dir == before
