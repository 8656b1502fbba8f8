"""Fused (zero-sync) AGGREGATED prove/verify validation + timing on TPU.

Run: python benchmarks/check_fused_agg_tpu.py [n] [m]
Cross-checks all four paths (fused/host JAX, native C++) on the same wire
format, then times warm wall latencies.
"""
import dataclasses
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cudabulletproof_tpu.models import aggregate, fused
from cudabulletproof_tpu.models.generators import get_generators
from cudabulletproof_tpu.utils import native, scalars as S, serialization

n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
m = int(sys.argv[2]) if len(sys.argv) > 2 else 4
N = n * m
gens = get_generators(N)
values = [(5 * j + 1) % (1 << n) for j in range(m)]
gammas = [S.sc_random() for _ in range(m)]

t0 = time.time()
proof = fused.prove_agg(values, gammas, n, gens)
print(f"fused.prove_agg compile+run: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
ok = fused.verify_agg(proof, gens)
print(f"fused.verify_agg compile+run: {time.time()-t0:.1f}s -> {ok}",
      flush=True)
assert ok, "fused agg verify rejected fused agg proof"

assert aggregate.verify(proof, gens), "host verify rejected fused agg proof"
print("host aggregate.verify accepts fused proof", flush=True)

hproof = aggregate.prove(values, gammas, n, gens)
assert fused.verify_agg(hproof, gens), "fused verify rejected host agg proof"
print("fused verifier accepts host aggregate proof", flush=True)

if native.available():
    blob = serialization.serialize_aggregated_proof(proof)
    assert native.verify_agg(blob), "native verifier rejected fused agg proof"
    nblob = native.prove_agg(values, gammas, n)
    nproof = serialization.deserialize_aggregated_proof(nblob)
    assert fused.verify_agg(nproof, gens), \
        "fused verifier rejected native agg proof"
    print("native cross-verification ok (both directions)", flush=True)

bad = dataclasses.replace(proof, t_hat=(proof.t_hat + 1) % S.ELL)
assert not fused.verify_agg(bad, gens), "tampered t_hat accepted"
bad = dataclasses.replace(proof, V=[proof.V[-1]] + list(proof.V[1:]))
if m > 1 and proof.V[0] != proof.V[-1]:
    assert not fused.verify_agg(bad, gens), "swapped V accepted"
print("tamper rejection ok", flush=True)

for fn, name in [(lambda: fused.prove_agg(values, gammas, n, gens),
                  "prove_agg"),
                 (lambda: fused.verify_agg(proof, gens), "verify_agg")]:
    ts = []
    for _ in range(5):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    ts.sort()
    print(f"warm fused.{name} (n={n}, m={m}, N={N}): median {ts[2]*1e3:.1f} ms"
          f" (min {ts[0]*1e3:.1f})", flush=True)

print("FUSED-AGG-TPU-OK")
