"""Decompose the non-kernel time of _msm_accum: prep (madd_precomp +
signed digits + reshapes) vs Horner window combine.
"""
import functools, os, statistics, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from cudabulletproof_tpu import config
from cudabulletproof_tpu.ops import curve as C, field as F, pippenger as PP
from cudabulletproof_tpu.utils import oracle

n = 1 << 16
w, lanes, unroll = 4, 1024, 4
base = C.from_oracle([oracle.BASE])
pts = C.GE(*(jnp.broadcast_to(c, (n,) + c.shape) for c in base))
import hashlib
sc = F.from_ints([int.from_bytes(hashlib.sha256(b"g%d" % i).digest(),
                                 "little") % oracle.ELL for i in range(n)])


def med(f, *a):
    jax.block_until_ready(f(*a))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


@jax.jit
def prep(points, scalars):
    digits = PP.extract_digits_signed(scalars, w)
    pre = PP.madd_precomp(points)
    nw = digits.shape[0]
    steps = n // (lanes * unroll)
    pt = pre.reshape(steps, unroll, lanes, 4 * F.L).transpose(0, 1, 3, 2)
    dg = digits.reshape(nw, steps, unroll, lanes)
    return pt.sum(), dg.sum()


@jax.jit
def precomp_only(points):
    return PP.madd_precomp(points).sum()


@jax.jit
def digits_only(scalars):
    return PP.extract_digits_signed(scalars, w).sum()


nw = 65
ws = C.GE(*(jnp.broadcast_to(c, (nw,) + c.shape) for c in base))


@jax.jit
def horner(wsums):
    out = PP._horner_windows(wsums, nw, w)
    return sum(c.sum() for c in out)


@jax.jit
def full(points, scalars):
    out = PP._msm_accum(points, scalars, w, lanes=lanes, unroll=unroll)
    return sum(c.sum() for c in out)


print(f"prep (precomp+digits+reshape): {med(prep, pts, sc)*1e3:.1f} ms")
print(f"  precomp only:                {med(precomp_only, pts)*1e3:.1f} ms")
print(f"  digits only:                 {med(digits_only, sc)*1e3:.1f} ms")
print(f"horner ({nw} windows, w={w}):    {med(horner, ws)*1e3:.1f} ms")
print(f"full _msm_accum:               {med(full, pts, sc)*1e3:.1f} ms")
