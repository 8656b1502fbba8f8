"""MSM + field-kernel benchmarks on the default device (TPU on hardware).

Measures the BASELINE.md targets:
  * MSM points/sec/chip at 2^16 (and 2^20 with --big)
  * batched fe25519 mul throughput (jnp path and Pallas kernel path)
  * single range-proof prove/verify latency
Prints one JSON line per metric.

Test points are derived on-device (P_i = (i+1+offset) * B) — generator
distribution does not affect bucket-method cost.  Correctness of the large
MSMs is checked by self-consistency (split-half additivity and Pippenger-vs-
windowed agreement at a subsampled size), since the python-int oracle is too
slow at 2^20.
"""
import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=5, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def emit(metric, value, unit, **kw):
    print(json.dumps({"metric": metric, "value": round(value, 6), "unit": unit, **kw}))


def make_points(n, seed=1):
    from cudabulletproof_tpu.ops import curve as C, field as F
    from cudabulletproof_tpu.utils import oracle
    base = C.from_oracle([oracle.BASE])
    base_b = C.GE(*(jnp.broadcast_to(c, (n,) + c.shape) for c in base))
    ks = [(seed + i * 0x9E3779B97F4A7C15) % oracle.ELL for i in range(n)]
    # chunked batched ladders to bound peak memory
    chunks = []
    step = min(n, 1 << 16)
    for off in range(0, n, step):
        sub = C.GE(*(c[off:off + step] for c in base_b))
        sc = F.from_ints(ks[off:off + step])
        chunks.append(C.scalarmult(sub, sc))
    pts = C.GE(*(jnp.concatenate([ch[i] for ch in chunks]) for i in range(4)))
    scalars = F.from_ints([(7 + i * 0xDEADBEEF12345) % oracle.ELL for i in range(n)])
    return pts, scalars


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true", help="include 2^20 MSM")
    ap.add_argument("--sizes", type=str, default="")
    args = ap.parse_args()

    from cudabulletproof_tpu.ops import curve as C, field as F, msm as M
    from cudabulletproof_tpu.ops import pallas_field as PF, pippenger

    from cudabulletproof_tpu.utils import profiling

    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev), "backend": jax.default_backend()}))

    # --- batched field mul ---
    n = 1 << 16
    import numpy as np
    rngnp = np.random.RandomState(0)
    a = jnp.asarray(rngnp.randint(0, F.MASK + 1, size=(n, F.L), dtype=np.int32))
    b = jnp.asarray(rngnp.randint(0, F.MASK + 1, size=(n, F.L), dtype=np.int32))
    t = timeit(F.mul, a, b, iters=20)
    emit("field_mul_jnp_throughput", n / t, "mul/s", batch=n, seconds=t)
    print(profiling.field_mul_roofline(n / t).to_json())
    t = timeit(PF.mul, a, b, iters=20)
    emit("field_mul_pallas_throughput", n / t, "mul/s", batch=n, seconds=t)
    print(profiling.field_mul_roofline(n / t).to_json())
    t = timeit(PF.inner_product, a, b, iters=20)
    emit("field_inner_product_pallas", n / t, "elem/s", batch=n, seconds=t)

    sizes = [1 << 16]
    if args.big:
        sizes.append(1 << 20)
    if args.sizes:
        sizes = [int(s) for s in args.sizes.split(",")]

    from cudabulletproof_tpu import config

    for nn in sizes:
        pts, scalars = make_points(nn)
        jax.block_until_ready(pts.x)
        w = config.msm_window_for(min(nn, config.MSM_CHUNK))
        fn = M.msm_auto          # size-routed: chunked Pippenger above MSM_CHUNK
        t = timeit(fn, pts, scalars, iters=3)
        emit(f"msm_points_per_sec_2e{nn.bit_length()-1}", nn / t, "points/s",
             n=nn, seconds=t, window=w)
        print(profiling.msm_roofline(nn / t, nn, w).to_json())
        # self-consistency: split-half additivity
        half = nn // 2
        r_full = fn(pts, scalars)
        r_a = fn(C.GE(*(c[:half] for c in pts)), scalars[:half])
        r_b = fn(C.GE(*(c[half:] for c in pts)), scalars[half:])
        ok = bool(C.eq(r_full, C.add(r_a, r_b)))
        print(json.dumps({"check": f"msm_split_half_2e{nn.bit_length()-1}", "ok": ok}))
        assert ok

    # --- prove/verify latency ---
    from cudabulletproof_tpu.models import rangeproof as rp
    from cudabulletproof_tpu.models.generators import get_generators
    from cudabulletproof_tpu.utils import scalars as S
    gens = get_generators(16)
    proof = rp.prove(42, S.sc_random(), 16, gens)
    assert rp.verify(proof, gens)
    t = timeit(lambda: rp.prove(42, 12345, 16, gens) and None or 0, iters=3)
    emit("range_prove_16bit_latency", t, "s")
    t = timeit(lambda: rp.verify(proof, gens) and None or 0, iters=5)
    emit("range_verify_16bit_latency", t, "s")
    t = timeit(lambda: rp.verify_fast(proof, gens) and None or 0, iters=10)
    emit("range_verify_fast_16bit_latency", t, "s",
         vs_baseline=round(0.015660 / t, 2))
    t = timeit(lambda: rp.prove_fast(42, 12345, 16, gens) and None or 0, iters=10)
    emit("range_prove_fast_16bit_latency", t, "s")

    # --- aggregated + batched verification (BASELINE config 5 workloads) ---
    from cudabulletproof_tpu.models import aggregate as agg
    m = 16
    gens_agg = get_generators(16 * m)
    aproof = agg.prove([v * 37 % 65536 for v in range(m)],
                       [S.sc_random() for _ in range(m)], 16, gens_agg)
    assert agg.verify(aproof, gens_agg)
    t = timeit(lambda: agg.verify(aproof, gens_agg) and None or 0, iters=3)
    emit("aggregated_verify_m16_n16_latency", t, "s", N=16 * m)
    proofs = [rp.prove(v, S.sc_random(), 16, gens) for v in (1, 7, 42, 65535)]
    assert agg.batch_verify(proofs, gens)
    t = timeit(lambda: agg.batch_verify(proofs, gens) and None or 0, iters=3)
    emit("batch_verify_4_proofs_latency", t, "s",
         per_proof=round(t / 4, 6))


if __name__ == "__main__":
    import os
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_bp_bench"))
    main()
