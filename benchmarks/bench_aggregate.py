"""Aggregated-proof scale profile: TPU vs native C++ at growing N = n*m.

VERDICT round-1 item 9: measure the regime where the TPU path beats the
native host path decisively and record the crossover.
Run: python benchmarks/bench_aggregate.py [cases as n:m pairs, default
16:16 and 64:64]
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cudabulletproof_tpu.models import aggregate
from cudabulletproof_tpu.models.generators import get_generators
from cudabulletproof_tpu.utils import native, scalars as S, serialization


def med(fn, iters=3):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts), r


def main():
    cases = [(16, 16), (64, 64)]
    if len(sys.argv) > 1:
        cases = [tuple(map(int, a.split(":"))) for a in sys.argv[1:]]
    for n, m in cases:
        N = n * m
        gens = get_generators(N)
        values = [(7 * j + 3) % (1 << n) for j in range(m)]
        gammas = [S.sc_random() for _ in range(m)]

        # --- TPU path (host Fiat-Shamir, device MSMs) ---
        aggregate.prove(values, gammas, n, gens)           # compile warmup
        t_prove, proof = med(lambda: aggregate.prove(values, gammas, n, gens))
        assert aggregate.verify(proof, gens)
        t_verify, ok = med(lambda: aggregate.verify(proof, gens))
        assert ok
        print(json.dumps({"path": "tpu", "n": n, "m": m, "N": N,
                          "prove_s": round(t_prove, 3),
                          "verify_s": round(t_verify, 3)}), flush=True)

        # --- native C++ path ---
        if native.available():
            t_np, blob = med(lambda: native.prove_agg(values, gammas, n),
                             iters=1 if N >= 4096 else 3)
            assert blob is not None
            t_nv, okn = med(lambda: native.verify_agg(blob),
                            iters=1 if N >= 4096 else 3)
            assert okn
            # cross-check: native proof accepted by the JAX verifier
            xp = serialization.deserialize_aggregated_proof(blob)
            assert aggregate.verify(xp, gens), "cross-verify failed"
            print(json.dumps({"path": "native", "n": n, "m": m, "N": N,
                              "prove_s": round(t_np, 3),
                              "verify_s": round(t_nv, 3),
                              "cross_verify": True}), flush=True)


if __name__ == "__main__":
    main()
