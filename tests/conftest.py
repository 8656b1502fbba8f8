"""Test harness: force CPU backend with 8 virtual devices so multi-chip
sharding paths (mesh/shard_map) are exercised without TPU hardware — this is
the 'fake backend' test strategy SURVEY.md §4 calls for.

NOTE: this environment pins JAX_PLATFORMS=axon (the TPU tunnel) and the
plugin overrides the env var, so platform selection must go through
jax.config.update, before any backend is initialized.
"""
import os
import resource

# XLA's CPU compiler overflows the default 8 MiB main-thread stack on the
# deepest limb-arithmetic graphs (observed: segfault inside
# backend_compile_and_load compiling the windowed MSM). Raise the soft limit
# to the hard limit before any compile runs.
try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except (ValueError, OSError):
    pass

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# jax's LRUCache.put writes cache entries with a bare write_bytes — a run
# killed mid-write (timeout, watchdog) leaves a truncated zstd file, and the
# next reader SEGFAULTS inside decompression. Make writes atomic
# (temp file + rename) so an interrupted test run can't poison the cache.
try:
    from jax._src import lru_cache as _lru

    _orig_put = _lru.LRUCache.put

    def _atomic_put(self, key, val):
        import pathlib
        import uuid

        real_write_bytes = pathlib.Path.write_bytes

        def write_bytes_atomic(path, data):
            tmp = path.with_name(f".tmp-{uuid.uuid4().hex}-{path.name}")
            real_write_bytes(tmp, data)
            os.replace(tmp, path)

        pathlib.Path.write_bytes = write_bytes_atomic
        try:
            _orig_put(self, key, val)
        finally:
            pathlib.Path.write_bytes = real_write_bytes

    _lru.LRUCache.put = _atomic_put
except Exception:
    pass
# persistent compile cache: the limb-arithmetic graphs are large and identical
# across test runs; caching makes reruns fast
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bp_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(1234)
