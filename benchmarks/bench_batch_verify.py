"""Batch-verify crossover vs the native single-core path (round-3 verdict
item 5): at what batch size does the TPU's ONE vmapped fused dispatch beat
native C++ ms/proof for plain 16-bit proofs?

The ~38 ms tunnel dispatch floor amortizes as floor/batch; device execution
is ~0.1 ms/proof (bench_fused_latency.py), so the crossover vs the ~1.5 ms
native path is expected between batch 32 and 64.

Run: python benchmarks/bench_batch_verify.py [nbits] [batch ...]
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cudabulletproof_tpu.models import fused, rangeproof as rp
from cudabulletproof_tpu.models.generators import get_generators
from cudabulletproof_tpu.utils import native, scalars as S, serialization


def med(fn, iters=7):
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    batches = [int(b) for b in sys.argv[2:]] or [16, 64, 256]
    gens = get_generators(n)
    # distinct proofs so the batch is honest work, not one cached row;
    # built by the native prover when available (~ms each — the host-JAX
    # prover pays ~0.5 s of tunnel syncs per proof, which at batch 4096
    # would be half an hour of setup for the same wire bytes)
    def mk(j):
        v = (42 * (j + 1)) % (1 << n)
        g = S.sc_random()
        if native.available():
            blob = native.prove_range(v, g, n)
            if blob is not None:
                return serialization.deserialize_range_proof(blob)
        return rp.prove(v, g, n, gens)
    proofs = [mk(j) for j in range(max(batches))]

    native_ms = None
    if native.available():
        blob = serialization.serialize_range_proof(proofs[0])
        assert native.verify_range(blob)
        native_ms = med(lambda: native.verify_range(blob), iters=15) * 1e3
        print(json.dumps({"path": "native_single", "ms_per_proof":
                          round(native_ms, 3)}), flush=True)

    for b in batches:
        sub = proofs[:b]
        t = med(lambda: fused.batch_verify(sub, gens), iters=5)
        rec = {"path": "tpu_batch_fused", "batch": b,
               "total_ms": round(t * 1e3, 1),
               "ms_per_proof": round(t / b * 1e3, 3)}
        if native_ms:
            rec["vs_native"] = round(native_ms / (t / b * 1e3), 2)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
