"""Characterize the fused verifier's fixed per-dispatch overhead (round-4
verdict weak #4): the N=256 aggregated verify walls ~100 ms against a ~38 ms
empty-dispatch floor and ~0.1 ms of device execution — WHERE do the other
~60 ms go?  Candidates: per-argument marshalling, host->device transfer,
program load (executable size), output sync, or execution that the chained
microbenches under-count.

Each probe isolates one axis at the REAL argument shapes of the n=16 single
and N=256 aggregated verifiers:

  empty            jit(x+1) on [8] i32                      -> tunnel floor
  trivial_same_args trivial body, exact verify arg shapes    -> arg cost
  trivial_hostargs  same, but args passed as host numpy      -> H2D transfer
  trivial_bigout    trivial body returning a [514, 80] array -> output cost
  progsize_u{K}     trivial args, K unrolled distinct ops    -> program load
  verify_wall       the real fused.verify / verify_agg walls -> total

Prints one JSON line per probe.  Run on TPU:
  python benchmarks/bench_dispatch_overhead.py [n] [m]
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cudabulletproof_tpu.models import fused, rangeproof as rp, aggregate
from cudabulletproof_tpu.models.generators import get_generators
from cudabulletproof_tpu.ops import scalar_field as SC
from cudabulletproof_tpu.utils import scalars as S


def med(fn, iters=9):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def report(name, ms, **kw):
    print(json.dumps({"probe": name, "ms": round(ms, 2), **kw}), flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    N = n * m

    f_id = jax.jit(lambda v: v + 1)
    x8 = jnp.zeros((8,), jnp.int32)
    report("empty", med(lambda: f_id(x8)) * 1e3)

    # --- single-proof shapes (n-bit) -------------------------------------
    gens = get_generators(max(n, N))
    proof = rp.prove(42, S.sc_random(), n, gens)
    blob_h = fused._proof_blob(proof)                     # host numpy
    gp = fused._gens_pack(gens, n)                        # device-resident
    rnd = SC.from_ints([3, 5])
    blob_d = jnp.asarray(blob_h)
    jax.block_until_ready((gp, rnd, blob_d))

    @jax.jit
    def trivial(blob, r, g):
        return (blob[0].astype(jnp.int32) + r[0, 0] + g[0, 0])

    report("trivial_same_args_devargs",
           med(lambda: trivial(blob_d, rnd, gp)) * 1e3,
           arg_bytes=int(blob_h.nbytes + rnd.nbytes + gp.nbytes))
    report("trivial_same_args_hostblob",
           med(lambda: trivial(jnp.asarray(blob_h), rnd, gp)) * 1e3)
    report("verify_wall_single",
           med(lambda: fused.verify(proof, gens)) * 1e3, n=n)

    # --- output size probe ----------------------------------------------
    @jax.jit
    def bigout(v):
        return jnp.broadcast_to(v[0], (514, 80)) + 1

    report("trivial_bigout_514x80", med(lambda: bigout(x8)) * 1e3,
           out_bytes=514 * 80 * 4)

    # --- program size probe ---------------------------------------------
    for k in (256, 4096, 16384):
        consts = np.arange(1, 65, dtype=np.int32)

        def make(k):
            @jax.jit
            def f(v):
                acc = v
                for i in range(k):       # k distinct unrolled ops
                    acc = acc * int(consts[i % 64]) + i
                return acc
            return f
        fk = make(k)
        report(f"progsize_u{k}", med(lambda: fk(x8)) * 1e3, unrolled_ops=k)

    # --- aggregated shapes (N = n*m) -------------------------------------
    values = [(5 * j + 1) % (1 << n) for j in range(m)]
    gammas = [S.sc_random() for _ in range(m)]
    aproof = aggregate.prove(values, gammas, n, gens)
    gpN = fused._gens_pack(gens, N)
    jax.block_until_ready(gpN)

    @jax.jit
    def trivialN(blob, r, g):
        return blob[0].astype(jnp.int32) + r[0, 0] + g[0, 0]

    ablob = jnp.asarray(fused._agg_blob(aproof)) if hasattr(
        fused, "_agg_blob") else None
    if ablob is None:
        # agg blob layout helper has a different name; probe with gpN only
        report("trivial_gpN_devargs",
               med(lambda: trivialN(blob_d, rnd, gpN)) * 1e3,
               gp_bytes=int(gpN.nbytes))
    else:
        jax.block_until_ready(ablob)
        report("trivial_agg_args_devargs",
               med(lambda: trivialN(ablob, rnd, gpN)) * 1e3,
               arg_bytes=int(ablob.nbytes + rnd.nbytes + gpN.nbytes))
    report("verify_wall_agg",
           med(lambda: fused.verify_agg(aproof, gens), iters=5) * 1e3,
           n=n, m=m, N=N)

    # --- re-probe the trivial dispatches AFTER the big programs ----------
    # Round-5 finding: the FIRST empty probe (before any big program runs)
    # measures ~0.05 ms, while every trivial probe afterwards costs ~25 ms
    # no matter its args/outputs/program size — the "dispatch floor" is
    # SESSION STATE, not argument cost.  These duplicates pin that down.
    report("empty_after_big", med(lambda: f_id(x8)) * 1e3)

    @jax.jit
    def fresh(v):
        return v * 2 - 1
    report("fresh_trivial_after_big", med(lambda: fresh(x8)) * 1e3)
    for _ in range(64):            # spam trivial dispatches: does it decay?
        jax.block_until_ready(f_id(x8))
    report("empty_after_spam", med(lambda: f_id(x8)) * 1e3)


if __name__ == "__main__":
    main()
