"""Fused (zero-sync) prove/verify smoke + cross-checks on the real TPU.

Run: python benchmarks/check_fused_tpu.py [nbits]
Validates models/fused.py end-to-end on hardware: fused proof accepted by
fused/host/deterministic verifiers, host proof accepted by fused verifier,
tamper + small-order rejection, batch verify.  (The CPU pytest twin is
tests/test_fused.py; the XLA:CPU compile of the fused prover is ~50 min on
this 1-core host, so hardware is also the fast way to check correctness.)
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cudabulletproof_tpu.models import fused, rangeproof as rp
from cudabulletproof_tpu.models.generators import get_generators
from cudabulletproof_tpu.utils import scalars as S

nbits = int(sys.argv[1]) if len(sys.argv) > 1 else 8
gens = get_generators(nbits)

t0 = time.time()
proof = fused.prove(42, S.sc_random(), nbits, gens)
print(f"fused.prove compile+run: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
ok = fused.verify(proof, gens)
print(f"fused.verify compile+run: {time.time()-t0:.1f}s -> {ok}", flush=True)
assert ok, "fused verify rejected fused proof"

assert rp.verify(proof, gens), "host verify rejected fused proof"
assert rp.verify_deterministic(proof, gens), \
    "deterministic verify rejected fused proof"
print("host verifiers accept fused proof", flush=True)

hproof = rp.prove(7, S.sc_random(), nbits, gens)
assert fused.verify(hproof, gens), "fused verify rejected host proof"
print("fused verifier accepts host proof", flush=True)

bad = dataclasses.replace(proof, t_hat=(proof.t_hat + 1) % S.ELL)
assert not fused.verify(bad, gens), "tampered t_hat accepted"
bad = dataclasses.replace(proof, V=proof.A)
assert not fused.verify(bad, gens), "swapped V accepted"
from cudabulletproof_tpu.utils import oracle
tor = oracle.small_order_points()
bad = dataclasses.replace(proof, A=tor[1].compress())
assert not fused.verify(bad, gens), "small-order A accepted"
print("tamper/torsion rejection ok", flush=True)

assert fused.batch_verify([proof, hproof], gens), "batch verify failed"
badm = dataclasses.replace(proof, mu=(proof.mu + 1) % S.ELL)
assert not fused.batch_verify([hproof, badm], gens), "bad batch accepted"
print("batch verify ok", flush=True)

# timing: warm single-dispatch latencies
for fn, name in [(lambda: fused.prove(42, 1234567, nbits, gens), "prove"),
                 (lambda: fused.verify(proof, gens), "verify")]:
    ts = []
    for _ in range(5):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    ts.sort()
    print(f"warm fused.{name}: median {ts[2]*1e3:.1f} ms "
          f"(min {ts[0]*1e3:.1f})", flush=True)

print("FUSED-TPU-OK")
