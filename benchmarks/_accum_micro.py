"""Time one accumulator-MSM window with pieces of the step body disabled,
to decompose the measured ~24 us/unroll-slot (vs ~3 us of madd math).
Run: python _accum_micro.py <variant> [w lanes unroll]
Variants: full nosel noadd cached tree
"""
import functools, os, statistics, sys, time, traceback
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from cudabulletproof_tpu.ops import pallas_curve as PC

L = 20
_identity_block = PC._identity_block
_const_fe = PC._const_fe
_D2_LIMBS = PC._D2_LIMBS
_padd = PC._padd
_madd = PC._madd

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "full"
w = int(sys.argv[2]) if len(sys.argv) > 2 else 4
lanes = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
unroll = int(sys.argv[4]) if len(sys.argv) > 4 else 4
n = 1 << 16
nb = (1 << (w - 1)) + 1
nw = 65                      # all windows: wall timing is reliable at this scale
steps = n // (lanes * unroll)


def kernel(p_ref, d_ref, o_ref, sacc_ref):
    j = pl.program_id(1)
    t = lanes

    @pl.when(j == 0)
    def _():
        sacc_ref[:, :, :] = jnp.broadcast_to(
            _identity_block(t)[None], (nb, 4 * L, t))

    dall = d_ref[0, 0]
    for u in range(unroll):
        d = dall[u:u + 1, :]
        q = p_ref[0, u]
        neg = d < 0
        m = jnp.where(neg, -d, d)
        ypx = jnp.where(neg, q[L:2 * L], q[0:L])
        ymx = jnp.where(neg, q[0:L], q[L:2 * L])
        td2 = jnp.where(neg, q[3 * L:4 * L], q[2 * L:3 * L])
        if VARIANT == "nosel":
            added = _madd(sacc_ref[1], ypx, ymx, td2)
            sacc_ref[1] = added
            continue
        if VARIANT == "cached":
            vals = [sacc_ref[b] for b in range(1, nb)]
            acc_sel = vals[0]
            for b in range(2, nb):
                acc_sel = jnp.where(m == b, vals[b - 1], acc_sel)
            added = _madd(acc_sel, ypx, ymx, td2)
            for b in range(1, nb):
                sacc_ref[b] = jnp.where(m == b, added, vals[b - 1])
            continue
        if VARIANT == "tree":
            # log-depth select of sacc[m] (and single-read write-back)
            vals = [sacc_ref[b] for b in range(1, nb)]        # m in 1..nb-1
            lvl = vals
            mm = m - 1                                        # 0-based
            bit = 1
            while len(lvl) > 1:
                nxt = []
                for i in range(0, len(lvl) - 1, 2):
                    nxt.append(jnp.where((mm & bit) == 0, lvl[i], lvl[i + 1]))
                if len(lvl) % 2:
                    nxt.append(lvl[-1])
                lvl = nxt
                bit <<= 1
            added = _madd(lvl[0], ypx, ymx, td2)
            for b in range(1, nb):
                sacc_ref[b] = jnp.where(m == b, added, vals[b - 1])
            continue
        acc_sel = sacc_ref[1] if nb > 1 else sacc_ref[0]
        for b in range(2, nb):
            acc_sel = jnp.where(m == b, sacc_ref[b], acc_sel)
        if VARIANT == "noadd":
            added = acc_sel
        else:
            added = _madd(acc_sel, ypx, ymx, td2)
        for b in range(1, nb):
            sacc_ref[b] = jnp.where(m == b, added, sacc_ref[b])

    @pl.when(j == steps - 1)
    def _():
        d2 = _const_fe(_D2_LIMBS, t)
        idb = _identity_block(t)

        def fold_body(k, carry):
            suf, tot = carry
            b = nb - 1 - k
            suf = _padd(suf, sacc_ref[b], d2)
            tot = _padd(tot, suf, d2)
            return suf, tot

        _, total = jax.lax.fori_loop(0, nb - 1, fold_body, (idb, idb))
        m = lanes
        while m > 1:
            half = m // 2
            dh = _const_fe(_D2_LIMBS, half)
            total = _padd(total[:, :half], total[:, half:m], dh)
            m = half
        o_ref[0] = jnp.pad(total, ((0, 0), (0, lanes - 1)))


pt = jnp.zeros((steps, unroll, 4 * L, lanes), jnp.int32)
pt = pt.at[:, :, 0, :].set(3).at[:, :, L, :].set(1).at[:, :, 2 * L, :].set(5)
import numpy as np
rng = np.random.default_rng(0)
dg = jnp.asarray(rng.integers(-(nb - 1), nb, (nw, steps, unroll, lanes)),
                 jnp.int32)
fn = jax.jit(lambda pt, dg: pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((nw, 4 * L, lanes), jnp.int32),
    grid=(nw, steps),
    in_specs=[
        pl.BlockSpec((1, unroll, 4 * L, lanes), lambda w, j: (j, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, unroll, lanes), lambda w, j: (w, j, 0, 0),
                     memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((1, 4 * L, lanes), lambda w, j: (w, 0, 0),
                           memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((nb, 4 * L, lanes), jnp.int32)],
)(pt, dg))
import numpy as np2


def run(pt, dg):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nw, 4 * L, lanes), jnp.int32),
        grid=(nw, steps),
        in_specs=[
            pl.BlockSpec((1, unroll, 4 * L, lanes), lambda w, j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, unroll, lanes), lambda w, j: (w, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4 * L, lanes), lambda w, j: (w, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nb, 4 * L, lanes), jnp.int32)],
    )(pt, dg)


jrun = jax.jit(lambda pt, dg: run(pt, dg)[:, :, 0].sum())
try:
    np2.asarray(jrun(pt, dg))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np2.asarray(jrun(pt, dg))
        ts.append(time.perf_counter() - t0)
    t = statistics.median(ts)
    slot_us = t / (nw * steps * unroll) * 1e6
    print(f"VARIANT {VARIANT} w={w} lanes={lanes} u={unroll}: "
          f"{t*1e3:.1f} ms total ({nw} win)  {t/nw*1e3:.2f} ms/window  "
          f"{slot_us:.2f} us/slot")
except Exception:
    traceback.print_exc(limit=3)
    print(f"VARIANT {VARIANT} FAILED")
