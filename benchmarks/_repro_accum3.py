"""Bisect the msm_bucket_accum Mosaic SIGABRT: variant kernels, each
stripping one piece of the v2 kernel. Run: python _repro_accum3.py <variant>
"""
import functools, os, sys, traceback
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
nw, steps, unroll, lanes, nb = 2, 4, 1, 1024, 9


def kernel(p_ref, d_ref, o_ref, sacc_ref):
    j = pl.program_id(1)
    t = lanes

    @pl.when(j == 0)
    def _():
        if VARIANT == "init_loop":
            for b in range(nb):
                sacc_ref[b] = _identity_block(t)
        else:
            sacc_ref[:, :, :] = jnp.broadcast_to(
                _identity_block(t)[None], (nb, 4 * L, t))

    if VARIANT != "nostep":
        dall = d_ref[0, 0]
        for u in range(unroll):
            d = dall[u:u + 1, :]
            q = p_ref[0, u]
            if VARIANT == "nosign":
                m = d
                ypx, ymx, td2 = q[0:L], q[L:2 * L], q[2 * L:3 * L]
            else:
                neg = d < 0
                m = jnp.where(neg, -d, d)
                ypx = jnp.where(neg, q[L:2 * L], q[0:L])
                ymx = jnp.where(neg, q[0:L], q[L:2 * L])
                td2 = jnp.where(neg, q[3 * L:4 * L], q[2 * L:3 * L])
            acc_sel = sacc_ref[1] if nb > 1 else sacc_ref[0]
            for b in range(2, nb):
                acc_sel = jnp.where(m == b, sacc_ref[b], acc_sel)
            if VARIANT == "padd":
                d2 = _const_fe(_D2_LIMBS, t)
                added = _padd(acc_sel, jnp.concatenate(
                    [ypx, ymx, td2, td2], axis=0), d2)
            else:
                added = _madd(acc_sel, ypx, ymx, td2)
            for b in range(1, nb):
                sacc_ref[b] = jnp.where(m == b, added, sacc_ref[b])

    @pl.when(j == steps - 1)
    def _():
        if VARIANT == "nofold":
            o_ref[0] = sacc_ref[1]
            return
        d2 = _const_fe(_D2_LIMBS, t)
        idb = _identity_block(t)
        if VARIANT == "halvonly":
            total = sacc_ref[1]
        elif VARIANT == "fori":
            def fold_body(k, carry):
                suf, tot = carry
                b = nb - 1 - k
                suf = _padd(suf, sacc_ref[b], d2)
                tot = _padd(tot, suf, d2)
                return suf, tot
            _, total = jax.lax.fori_loop(0, nb - 1, fold_body, (idb, idb))
        else:
            suf = tot = idb
            for b in range(nb - 1, 0, -1):
                suf = _padd(suf, sacc_ref[b], d2)
                tot = _padd(tot, suf, d2)
            total = tot
        if VARIANT == "sufonly":
            o_ref[0] = total
            return
        m = lanes
        while m > 1:
            half = m // 2
            dh = _const_fe(_D2_LIMBS, half)
            total = _padd(total[:, :half], total[:, half:m], dh)
            m = half
        o_ref[0] = jnp.pad(total, ((0, 0), (0, lanes - 1)))


pt = jnp.zeros((steps, unroll, 4 * L, lanes), jnp.int32)
pt = pt.at[:, :, L, :].set(1).at[:, :, 2 * L, :].set(1)
dg = jnp.zeros((nw, steps, unroll, lanes), jnp.int32)
try:
    out = pl.pallas_call(
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
    print("VARIANT", VARIANT, "OK", jax.block_until_ready(out).shape)
except Exception:
    traceback.print_exc(limit=2)
    print("VARIANT", VARIANT, "FAILED")
