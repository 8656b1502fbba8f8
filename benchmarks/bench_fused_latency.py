"""Decompose the fused verify/prove latency on hardware.

Separates: tunnel dispatch floor, host->device argument transfer cost,
device execution (chained k-times measurement), and batch-amortized
per-proof cost.  Run: python benchmarks/bench_fused_latency.py [nbits]
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cudabulletproof_tpu.models import fused, rangeproof as rp
from cudabulletproof_tpu.models.generators import get_generators
from cudabulletproof_tpu.ops import curve as C, scalar_field as SC
from cudabulletproof_tpu.utils import scalars as S


def med(fn, iters=9):
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def out(**kw):
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    gens = get_generators(n)
    proof = rp.prove(42, S.sc_random(), n, gens)

    # 0) dispatch floor
    f_id = jax.jit(lambda v: v + 1)
    x0 = jnp.zeros((8,), jnp.int32)
    out(stage="dispatch_floor", ms=med(lambda: jax.block_until_ready(f_id(x0))) * 1e3)

    # 1) full wall (host prep + transfers + dispatch + device)
    out(stage="verify_wall", ms=med(lambda: fused.verify(proof, gens)) * 1e3)

    # 2) device-resident args: same jitted fn, inputs already on device
    blob = jax.block_until_ready(jnp.asarray(fused._proof_blob(proof)))
    rnd = jax.block_until_ready(SC.from_ints([12345, 67890]))
    gp = jax.block_until_ready(fused._gens_pack(gens, n))
    jfn, body = fused._verify_fn(n)
    out(stage="verify_device_args",
        ms=med(lambda: jax.block_until_ready(jfn(blob, rnd, gp))) * 1e3)

    # 3) chained k-times verify body: pure device execution per verify
    k = 8

    @jax.jit
    def chained(blob, rnd, gp):
        ok = jnp.bool_(True)
        rr = rnd
        for _ in range(k):
            ok = jnp.logical_and(ok, body(blob, rr, gp))
            rr = SC.mul(rr, rnd)        # vary the RLC weights per iteration
        return ok

    t_k = med(lambda: jax.block_until_ready(chained(blob, rnd, gp)), iters=5)
    t_1 = med(lambda: jax.block_until_ready(jfn(blob, rnd, gp)), iters=5)
    out(stage="verify_device_exec", ms=(t_k - t_1) / (k - 1) * 1e3,
        note="(T_k - T_1)/(k-1), transfer+floor cancelled")

    # 4) batch-amortized: 16 proofs in one dispatch
    proofs = [proof] * 16
    t_b = med(lambda: fused.batch_verify(proofs, gens), iters=5)
    out(stage="batch16_wall_per_proof", ms=t_b / 16 * 1e3, total_ms=t_b * 1e3)

    # 5) prove wall
    out(stage="prove_wall",
        ms=med(lambda: fused.prove(42, 1234567, n, gens), iters=5) * 1e3)


if __name__ == "__main__":
    main()
