"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: 16-bit range-proof verification latency (the reference's recorded
number: 0.015660 s on an sm_80 GPU — BASELINE.md / ipynb cell 18).
vs_baseline = reference_time / our_time (>1 means faster than reference).

The same JSON line also records TPU-EXECUTED metrics (round-2 verdict
item 5): batch-16 zero-sync verification (ONE vmapped fused dispatch,
ms/proof) and bucket-method MSM throughput at 2^16 — the two regimes where
the accelerator path, not the native host path, is the right tool.  Set
BP_BENCH_HEADLINE_ONLY=1 to skip the TPU extras (they cost two extra
compiles through the tunnel).
"""
import json
import os
import statistics
import sys
import time

os.environ.setdefault("JAX_FLAGS", "")

BASELINE_VERIFY_S = 0.015660  # CUDA path, BASELINE.md


def _tpu_extras(proof, gens):
    """TPU-executed metrics; best-effort (never sink the headline)."""
    import jax
    import jax.numpy as jnp
    out = {}
    from cudabulletproof_tpu import config
    from cudabulletproof_tpu.models import fused
    from cudabulletproof_tpu.ops import curve as C, field as F
    from cudabulletproof_tpu.ops.pippenger import msm_pippenger

    # batch-16 fused verify: ONE vmapped single-dispatch program
    proofs = [proof] * 16
    assert fused.batch_verify(proofs, gens)          # compile + gate
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        ok = fused.batch_verify(proofs, gens)
        ts.append(time.perf_counter() - t0)
        assert ok
    t = statistics.median(ts)
    out["tpu_batch16_verify_ms_per_proof"] = round(t / 16 * 1e3, 3)

    # bucket-method MSM throughput, 2^16 points (BASELINE.md workload)
    n = 1 << 16
    w = config.msm_window_for(n)
    base = C.base_point()
    idx = jnp.arange(1, n + 1, dtype=jnp.int32)
    sc = jnp.zeros((n, F.L), jnp.int32).at[:, 0].set(idx & F.MASK)
    sc = sc.at[:, 1].set(idx >> F.W)
    pts = C.scalarmult(C.GE(*(jnp.broadcast_to(c, (n, F.L)) for c in base)),
                       sc)
    ks = jnp.asarray(jnp.arange(n)[:, None] * 7919 % (F.MASK + 1)
                     ).astype(jnp.int32) * jnp.ones((1, F.L), jnp.int32)
    fn = lambda: jax.block_until_ready(msm_pippenger(pts, ks, w=w))
    fn()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    out["tpu_msm_2e16_points_per_sec"] = round(n / statistics.median(ts))
    out["tpu_msm_window_bits"] = w
    return out


def main():
    import jax
    # opt-in persistent cache only: through the tunneled TPU backend the
    # cache's executable serialization ~doubles compile time and never hits
    # cross-process (measured 2026-08-17; see NOTES.md)
    cache = os.environ.get("BP_COMPILE_CACHE", "")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
    from cudabulletproof_tpu.models import rangeproof as rp
    from cudabulletproof_tpu.models.generators import get_generators
    from cudabulletproof_tpu.utils import scalars as S

    gens = get_generators(16)
    proof = rp.prove(42, S.sc_random(), 16, gens)
    assert rp.verify(proof, gens)          # TPU fused path: warmup + gate
    assert rp.verify_fast(proof, gens)     # framework fast path (native host)

    times = []
    for _ in range(30):
        t0 = time.perf_counter()
        ok = rp.verify_fast(proof, gens)
        times.append(time.perf_counter() - t0)
        assert ok
    t = statistics.median(times)
    rec = {
        "metric": "range_proof_verify_16bit_latency",
        "value": round(t, 6),
        "unit": "s",
        "vs_baseline": round(BASELINE_VERIFY_S / t, 4),
    }
    if not os.environ.get("BP_BENCH_HEADLINE_ONLY"):
        try:
            rec.update(_tpu_extras(proof, gens))
        except Exception as e:          # extras never sink the headline
            rec["tpu_extras_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
