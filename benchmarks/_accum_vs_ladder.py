"""A/B one mid-size MSM inside a jit: accumulator kernel (incl. its
madd_precomp + digit glue) vs the flat Pallas ladder + tree reduce —
the two candidates for fused-program MSMs at 2K-16K bases.
Run: python _accum_vs_ladder.py [n]
"""
import functools, os, statistics, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import hashlib
import jax, jax.numpy as jnp
from cudabulletproof_tpu import config
from cudabulletproof_tpu.ops import curve as C, field as F, pippenger as PP
from cudabulletproof_tpu.ops import pallas_curve as PC
from cudabulletproof_tpu.utils import oracle

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
base = C.from_oracle([oracle.BASE])
bb = C.GE(*(jnp.broadcast_to(c, (n,) + c.shape) for c in base))
sc0 = F.from_ints([(1 + i * 0x9E3779B9) % oracle.ELL for i in range(n)])
pts = C.scalarmult(bb, sc0)
ks = F.from_ints([int.from_bytes(hashlib.sha256(b"avl%d" % i).digest(),
                                 "little") % oracle.ELL for i in range(n)])
jax.block_until_ready(pts.x)


import numpy as np


def med(f):
    g = jax.jit(lambda p, s: sum(c.sum() for c in f(p, s)))
    out = f(pts, ks)
    np.asarray(g(pts, ks))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(g(pts, ks))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts), out


results = {}
for w in (3, 4):
    t, out = med(functools.partial(PP._msm_accum, w=w))
    results[f"accum w={w}"] = (t, out)
    print(f"accum w={w}: {t*1e3:7.2f} ms  ({n/t/1e3:.0f} K pts/s)",
          flush=True)

t, out = med(lambda p, s: PC.msm(p, s))
results["ladder"] = (t, out)
print(f"ladder+reduce: {t*1e3:7.2f} ms  ({n/t/1e3:.0f} K pts/s)", flush=True)

ref = results["ladder"][1]
for k, (t, out) in results.items():
    ok = bool(C.eq(out, ref))
    assert ok, k
print("all paths agree", flush=True)
