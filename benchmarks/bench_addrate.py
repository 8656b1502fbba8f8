"""Fused point-add rate microbench: where does the Mosaic time go?

Measures the VMEM-resident group-law rates with NO HBM traffic in the hot
loop (a K-deep chained add/double inside one kernel), sweeping:
  * lane width (256 / 512 / 1024 / 2048) — if Mosaic per-op overhead is
    fixed per op, wider tiles raise the rate proportionally;
  * carry-relaxation passes per field op — isolates the relax share
    (timing-only variants; fewer passes than the proven bound give WRONG
    values but identical op mix per pass).

Round-2 verdict item 3: the windowed ladder's 1.11x (vs 2x op-count cut)
says most kernel time is not math; this pins down what is.

Run on TPU: python benchmarks/bench_addrate.py
"""
import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cudabulletproof_tpu.ops import curve as C, field as F
from cudabulletproof_tpu.ops import pallas_curve as PC, pallas_field as PF
from cudabulletproof_tpu.utils import oracle

L = F.L
# chained ops per kernel invocation: must put execution time well above the
# ~30 ms tunnel sync floor (4096 x 2048 lanes ~ 8.4 M adds ~ 135 ms at the
# seg-scan-observed 62 M adds/s)
K = int(os.environ.get("BP_ADDRATE_K", "4096"))


def _relax(t, passes):
    return PF._carry_relax(t, passes)


def make_ops(mul_passes, add_passes):
    def fmul(a, b):
        return _relax(PF._fold_wide(PF._conv(a, b)), mul_passes)

    def fsq(a):
        # same symmetric conv as PF._conv_sq but with tunable relax passes
        a2 = a + a
        parts = []
        for i in range(L):
            head = a[i:i + 1, :] * a[i:i + 1, :]
            if i + 1 < L:
                tail = a[i, :][None, :] * a2[i + 1:, :]
                seg = jnp.concatenate([head, tail], axis=0)
            else:
                seg = head
            parts.append(jnp.pad(
                seg, ((2 * i, 2 * L - 1 - (i + L - 1) - 1), (0, 0))))
        return _relax(PF._fold_wide(sum(parts)), mul_passes)

    def fadd(a, b):
        return _relax(a + b, add_passes)

    def fsub(a, b):
        row = jax.lax.broadcasted_iota(jnp.int32, b.shape, 0)
        k = jnp.where(row == 0, PC._KNEG0, PC._KNEG1)
        return _relax(a + (k - b), add_passes)

    def padd(p, q, d2):
        x1, y1, z1, t1 = p[0:L], p[L:2*L], p[2*L:3*L], p[3*L:4*L]
        x2, y2, z2, t2 = q[0:L], q[L:2*L], q[2*L:3*L], q[3*L:4*L]
        a = fmul(fsub(y1, x1), fsub(y2, x2))
        b = fmul(fadd(y1, x1), fadd(y2, x2))
        c = fmul(fmul(t1, d2), t2)
        zz = fmul(z1, z2)
        d = fadd(zz, zz)
        return jnp.concatenate(
            [fmul(fsub(b, a), fsub(d, c)), fmul(fadd(d, c), fadd(b, a)),
             fmul(fsub(d, c), fadd(d, c)), fmul(fsub(b, a), fadd(b, a))],
            axis=0)

    def pdbl(p):
        x, y, z = p[0:L], p[L:2*L], p[2*L:3*L]
        xx = fsq(x)
        yy = fsq(y)
        zz2 = _relax(fsq(z) * 2, add_passes)
        xy2 = fsub(fsq(fadd(x, y)), fadd(xx, yy))
        yp = fadd(yy, xx)
        zp = fsub(yy, xx)
        tp = fsub(zz2, zp)
        return jnp.concatenate(
            [fmul(xy2, tp), fmul(yp, zp), fmul(zp, tp), fmul(xy2, yp)],
            axis=0)

    return padd, pdbl


def chain_kernel(p_ref, o_ref, *, op, mul_passes, add_passes):
    padd, pdbl = make_ops(mul_passes, add_passes)
    t = p_ref.shape[1]
    d2 = PC._const_fe(PC._D2_LIMBS, t)
    p = p_ref[:, :]

    if op == "add":
        body = lambda i, acc: padd(acc, p, d2)
    elif op == "dbl":
        body = lambda i, acc: pdbl(acc)
    else:                                    # mul: raw field-mul chain
        def body(i, acc):
            m = make_ops(mul_passes, add_passes)
            prod = m[0](acc[0:L], p[0:L])    # not used; keep simple
            return acc
    out = jax.lax.fori_loop(0, K, body, p)
    o_ref[:, :] = out


def run(op, lanes, mul_passes=5, add_passes=2, reps=10):
    kern = functools.partial(chain_kernel, op=op, mul_passes=mul_passes,
                             add_passes=add_passes)
    pt = C.base_point((lanes,))
    flat = PC._pad_lanes(PC._flatten(pt), lanes)

    @jax.jit
    def go(flat):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((4 * L, lanes), jnp.int32),
            in_specs=[pl.BlockSpec((4 * L, lanes), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((4 * L, lanes), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=PF._interpret(),
        )(flat)

    @jax.jit
    def go_sum(flat):
        # scalar-valued: through the tunnel, block_until_ready only confirms
        # ENQUEUE; a value fetch is the only reliable sync (NOTES.md)
        return jnp.sum(go(flat).astype(jnp.float32))

    float(go_sum(flat))                      # compile + sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(go_sum(flat))
        ts.append(time.perf_counter() - t0)
    t = statistics.median(ts)
    rate = K * lanes / t
    print(f"{op:4s} lanes={lanes:5d} mulpass={mul_passes} addpass={add_passes}"
          f"  {t*1e3:7.3f} ms  {rate/1e6:8.1f} M ops/s", flush=True)
    return rate


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}  K={K} chained ops", flush=True)
    for lanes in (256, 512, 1024, 2048):
        run("add", lanes)
    for lanes in (256, 1024):
        run("dbl", lanes)
    # carry-relax share (timing-only: fewer passes -> wrong values, same mix)
    for mp, ap in ((4, 2), (3, 1), (1, 1), (0, 0)):
        run("add", 1024, mul_passes=mp, add_passes=ap)
