"""Test harness: force CPU backend with 8 virtual devices so multi-chip
sharding paths (mesh/shard_map) are exercised without TPU hardware — this is
the 'fake backend' test strategy SURVEY.md §4 calls for.

NOTE: this environment pins JAX_PLATFORMS=axon (the TPU tunnel) and the
plugin overrides the env var, so platform selection must go through
jax.config.update, before any backend is initialized.
"""
import os
import resource

# XLA:CPU executables for the big limb-arithmetic graphs create tens of
# thousands of memory mappings each when compiled OR deserialized; a few of
# them in one process exhausts the kernel's default vm.max_map_count
# (65530) and the next mmap failure surfaces as a segfault deep inside
# compile/deserialize/cache paths (measured: /proc/self/maps hit 64527 at
# the moment of the crash).  Writing the sysctl is a host-global persistent
# change, so it is opt-in (BP_RAISE_MAP_COUNT=1); otherwise we only warn
# with the exact command (round-1 advisor finding).
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        _maps = int(_f.read())
    if _maps < 1 << 21:
        if os.environ.get("BP_RAISE_MAP_COUNT"):
            with open("/proc/sys/vm/max_map_count", "w") as _f:
                _f.write(str(1 << 22))
        else:
            import warnings
            warnings.warn(
                "vm.max_map_count=%d is too low for this suite's XLA:CPU "
                "executables and compiles/cache reads may SEGFAULT. Run "
                "`sysctl -w vm.max_map_count=%d` (or set "
                "BP_RAISE_MAP_COUNT=1 to let conftest write it)."
                % (_maps, 1 << 22))
except OSError:
    pass

# Belt-and-braces: XLA compile recursion is deep on these graphs; give the
# main thread and glibc's default pthread stacks generous FINITE room.
_STACK_WANT = 1 << 29                                 # 512 MiB
try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = _STACK_WANT if _hard == resource.RLIM_INFINITY \
        else min(_STACK_WANT, _hard)
    resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))
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
