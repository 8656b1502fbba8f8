"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: 16-bit range-proof verification latency (the reference's recorded
number: 0.015660 s on an sm_80 GPU — BASELINE.md / ipynb cell 18).
vs_baseline = reference_time / our_time (>1 means faster than reference).
"""
import json
import os
import statistics
import sys
import time

os.environ.setdefault("JAX_FLAGS", "")

BASELINE_VERIFY_S = 0.015660  # CUDA path, BASELINE.md


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
    print(json.dumps({
        "metric": "range_proof_verify_16bit_latency",
        "value": round(t, 6),
        "unit": "s",
        "vs_baseline": round(BASELINE_VERIFY_S / t, 4),
    }))


if __name__ == "__main__":
    main()
