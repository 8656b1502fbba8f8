"""A/B: one-kernel Pallas scan vs XLA chunked scan in the 2^16 bucket MSM.
Run: BP_MSM_PALLAS_SCAN=0|1 python benchmarks/bench_scan_ab.py [n]
"""
import os, sys, time, statistics
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from cudabulletproof_tpu.ops import curve as C, field as F, pippenger as PP
from cudabulletproof_tpu import config
from cudabulletproof_tpu.utils import oracle

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
base = C.from_oracle([oracle.BASE])
ks = [(123 + i * 0x9E3779B97F4A7C15) % oracle.ELL for i in range(n)]
pts = C.scalarmult(C.GE(*(jnp.broadcast_to(c, (n, F.L)) for c in base)),
                   F.from_ints(ks))
sc = F.from_ints([(7 + i * 0xDEADBEEF12345) % oracle.ELL for i in range(n)])
jax.block_until_ready(pts.x)
w = config.msm_window_for(n)
t0 = time.time()
r = PP.msm_pippenger(pts, sc, w=w)
jax.block_until_ready(r.x)
print(f"pallas_scan={config.MSM_PALLAS_SCAN} n={n} w={w} "
      f"compile+run {time.time()-t0:.1f}s", flush=True)
ts = []
for _ in range(5):
    t0 = time.time()
    jax.block_until_ready(PP.msm_pippenger(pts, sc, w=w).x)
    ts.append(time.time() - t0)
t = statistics.median(ts)
print(f"warm {t*1e3:.1f} ms  {n/t/1e3:.0f} K pts/s", flush=True)
# correctness: split-half additivity
half = n // 2
ra = PP.msm_pippenger(C.GE(*(c[:half] for c in pts)), sc[:half], w=w)
rb = PP.msm_pippenger(C.GE(*(c[half:] for c in pts)), sc[half:], w=w)
print("split_half_ok", bool(C.eq(r, C.add(ra, rb))), flush=True)
