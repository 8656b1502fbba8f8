"""Worker for the 2-process jax.distributed CPU test (test_msm.py).

Each process owns 2 virtual CPU devices; the 4-device global mesh runs the
sharded MSM with every process holding only its local shards — the real
multi-host data path (jax.distributed.initialize + make_array_from_callback),
not the single-process virtual-mesh shortcut.  Prints DIST-OK on success.

Usage: python tests/distributed_worker.py <process_id> <num_processes> <port>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=2 "
                           + os.environ.get("XLA_FLAGS", ""))
# per-process compile cache: two processes sharing one cache dir race on
# writes (measured segfaults; see tests/conftest.py)
cache = f"/tmp/jax_cache_bp_dist_{pid}"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from cudabulletproof_tpu.ops import curve as C, field as F
from cudabulletproof_tpu.parallel import mesh as mesh_lib
from cudabulletproof_tpu.parallel.sharded_msm import msm_sharded
from cudabulletproof_tpu.utils import oracle

assert len(jax.devices()) == 2 * nproc, jax.devices()
mesh = mesh_lib.make_mesh()                       # all 2*nproc global devices

n = 16
pts = [oracle.hash_to_point(b"dist", i) for i in range(n)]
sc_ints = [(i * 0x9E3779B97F4A7C15 + 3) % oracle.ELL for i in range(n)]

# identical full arrays on every process; the global jax.Array reads only
# this process's shards out of them
full = [np.asarray(c) for c in C.from_oracle(pts)]
sc_full = np.asarray(F.from_ints(sc_ints))
sharding = NamedSharding(mesh, P("dp", None))
mk = lambda a: jax.make_array_from_callback(
    a.shape, sharding, lambda idx: a[idx])
points = C.GE(*(mk(c) for c in full))
scalars = mk(sc_full)

# outer jit with explicit replicated out_shardings so every process can read
# the result with plain np.asarray (local shard of a fully-replicated array)
rep = NamedSharding(mesh, P())
fn = jax.jit(lambda p, s: msm_sharded(p, s, mesh=mesh, w=0),
             out_shardings=C.GE(rep, rep, rep, rep))
# Gloo communicator init happens at EXECUTION and carries a fixed 30 s
# KV-store deadline; if the first collective sits inside a cold-cache big
# program, the inter-process compile skew (~minutes on this 1-core box
# under load) blows the deadline (observed: DEADLINE_EXCEEDED
# cpu:gloo/0,1,2048,2049 at 30 s).  So: AOT-compile first (pure host work,
# no collectives), then barrier, then execute — both processes enter the
# 4-device rendezvous within seconds of each other.
from jax.experimental import multihost_utils
compiled = fn.lower(points, scalars).compile()
multihost_utils.sync_global_devices("bp-dist-precompiled")
out = compiled(points, scalars)
got = C.to_oracle(C.GE(*(np.asarray(c) for c in out)))[0]

want = oracle.IDENTITY
for p, s in zip(pts, sc_ints):
    want = want + s * p
assert got == want, f"process {pid}: sharded MSM mismatch"
print("DIST-OK", pid, flush=True)
