"""Pallas TPU kernels for fused ge25519 point operations.

Native-kernel parity with the reference's point-level CUDA layer (SURVEY.md
§2.5):
  point_scalar_mul_kernel   (cuda_bulletproof_kernels.cu:26-42)  -> scalarmult
  point_accumulate_kernel   (cuda_bulletproof_kernels.cu:45-116) -> tree_reduce
  device_ge25519_add        (device_curve25519_ops.cuh:174-241)  -> add

Kernel design (TPU-first):
  * A batch of points lives in HBM as one int32 array [n, 80] (x|y|z|t, each
    20 radix-2^13 limbs); in-kernel tiles are [80, T] — coordinates+limbs on
    sublanes, points on lanes — so every field op inside the group law is a
    full-width VPU op across the point tile.
  * The whole group-law straight-line program (9 field muls for the unified
    add) runs register/VMEM-resident: one HBM read per operand and one write
    per result, where the XLA composition writes intermediates between fused
    regions.  For the 253-step ladder this removes ~253 round trips of the
    accumulator (the dominant HBM traffic of the XLA ladder).
  * Bounds: identical weak-normalization discipline as ops/field.py /
    ops/pallas_field.py (limbs <= 8799; conv peak 20*8799^2 < 2^31).  The
    kernels are bit-compatible with ops/curve.py at the canonical-bytes level
    and are tested against it in interpret mode (tests/test_pallas_curve.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import curve as C
from . import field as F
from . import pallas_field as PF
from ..utils import oracle

LANES = PF.LANES
L = F.L
MASK = F.MASK
W = F.W
SC_BITS = C.SC_BITS

# 2d curve constant as static python limbs (kernels cannot capture array
# constants; rebuilt in-kernel from these ints). Pure-python on purpose:
# this module may be imported lazily inside a jit trace.
_D2_LIMBS = tuple((oracle.D2 >> (W * i)) & MASK for i in range(L))
_KNEG0, _KNEG1 = int(F._K_NEG[0]), int(F._K_NEG[1])


def _const_fe(limbs, t: int):
    """[20, T] tile holding one field constant per-lane (from python limbs)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (L, t), 0)
    out = jnp.zeros((L, t), jnp.int32)
    for i, v in enumerate(limbs):
        if v:
            out = jnp.where(row == i, v, out)
    return out


def _fadd(a, b):
    return PF._carry_relax(a + b, 2)


def _fsub(a, b):
    row = jax.lax.broadcasted_iota(jnp.int32, b.shape, 0)
    k = jnp.where(row == 0, _KNEG0, _KNEG1)
    return PF._carry_relax(a + (k - b), 2)


_fmul = PF._conv_fold
_fsq = PF._conv_sq


def _pdbl(p):
    """Dedicated extended doubling (ge_p2_dbl formulas, a=-1): 4 squares +
    4 muls vs the unified add's 9 muls — and squares use the symmetric
    half-size convolution.  ~45% cheaper than _padd(p, p)."""
    x, y, z = p[0:L], p[L:2 * L], p[2 * L:3 * L]
    xx = _fsq(x)
    yy = _fsq(y)
    zz2 = PF._carry_relax(_fsq(z) * 2, 2)
    xy2 = _fsub(_fsq(_fadd(x, y)), _fadd(xx, yy))   # 2xy
    yp = _fadd(yy, xx)
    zp = _fsub(yy, xx)
    tp = _fsub(zz2, zp)
    return jnp.concatenate(
        [_fmul(xy2, tp), _fmul(yp, zp), _fmul(zp, tp), _fmul(xy2, yp)],
        axis=0)


def _padd(p, q, d2):
    """Unified extended add on [80, T] blocks (add-2008-hwcd-3, a=-1).
    Same formula as ops/curve.py::add / the reference's ge25519_add
    (curve25519_ops.cu:326-378)."""
    x1, y1, z1, t1 = p[0:L], p[L:2 * L], p[2 * L:3 * L], p[3 * L:4 * L]
    x2, y2, z2, t2 = q[0:L], q[L:2 * L], q[2 * L:3 * L], q[3 * L:4 * L]
    a = _fmul(_fsub(y1, x1), _fsub(y2, x2))
    b = _fmul(_fadd(y1, x1), _fadd(y2, x2))
    c = _fmul(_fmul(t1, d2), t2)
    zz = _fmul(z1, z2)
    d = _fadd(zz, zz)
    e = _fsub(b, a)
    f = _fsub(d, c)
    g = _fadd(d, c)
    h = _fadd(b, a)
    return jnp.concatenate(
        [_fmul(e, f), _fmul(g, h), _fmul(f, g), _fmul(e, h)], axis=0)


def _identity_block(t: int):
    """[80, T] identity points: x=0, y=1, z=1, t=0."""
    row = jax.lax.broadcasted_iota(jnp.int32, (4 * L, t), 0)
    one = jnp.logical_or(row == L, row == 2 * L)   # y limb0, z limb0
    return jnp.where(one, 1, 0).astype(jnp.int32)


# --- flat <-> GE conversion ---------------------------------------------------
def _flatten(p: C.GE) -> jax.Array:
    """GE [n] -> [n, 80]."""
    return jnp.concatenate([p.x, p.y, p.z, p.t], axis=-1)


def _unflatten(a: jax.Array) -> C.GE:
    return C.GE(a[..., 0:L], a[..., L:2 * L], a[..., 2 * L:3 * L],
                a[..., 3 * L:4 * L])


def _pad_lanes(x: jax.Array, npad: int, fill=None) -> jax.Array:
    """[n, k] -> [k, npad] transposed tile input."""
    n = x.shape[0]
    if n != npad:
        pad = jnp.zeros((npad - n, x.shape[1]), x.dtype) if fill is None \
            else jnp.broadcast_to(fill, (npad - n, x.shape[1])).astype(x.dtype)
        x = jnp.concatenate([x, pad], axis=0)
    return x.T


import numpy as _np

_ID_ROW = _np.zeros((4 * L,), _np.int32)   # numpy on purpose: safe to cache
_ID_ROW[L] = 1
_ID_ROW[2 * L] = 1


def _identity_row():
    return _ID_ROW


# --- kernels ------------------------------------------------------------------
def _add_kernel(a_ref, b_ref, o_ref):
    d2 = _const_fe(_D2_LIMBS, a_ref.shape[1])
    o_ref[:, :] = _padd(a_ref[:, :], b_ref[:, :], d2)


def _double_kernel(a_ref, o_ref):
    o_ref[:, :] = _pdbl(a_ref[:, :])


def _ladder_kernel(p_ref, s_ref, o_ref):
    """Batched branchless double-and-add, VMEM-resident.
    Reference parity: point_scalar_mul_kernel
    (cuda_bulletproof_kernels.cu:26-42), one lane = one point.

    Mosaic forbids dynamic (sub)lane indexing, so instead of indexing scalar
    bit k each round, the scalar tile itself is a loop carry shifted left one
    bit per iteration: the current bit is always (limb 19 >> 12) & 1 — static
    indexing only.  260 = 20*13 iterations cover all limb bits (top 7 are
    zero for scalars < 2^253)."""
    t = p_ref.shape[1]
    d2 = _const_fe(_D2_LIMBS, t)
    p = p_ref[:, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (L, t), 0)

    def body(i, carry):
        acc, s = carry
        bits = (s[L - 1:L, :] >> (W - 1)) & 1
        acc = _padd(acc, acc, d2)
        added = _padd(acc, p, d2)
        acc = jnp.where(bits == 1, added, acc)
        # shift the whole scalar left one bit (carry between limbs; the bit
        # rolled out of limb 19 is consumed, so row 0's incoming carry is 0)
        c = pltpu.roll(s >> (W - 1), shift=1, axis=0)
        c = jnp.where(row == 0, 0, c)
        s = ((s << 1) & MASK) + c
        return acc, s

    acc, _ = jax.lax.fori_loop(
        0, L * W, body, (_identity_block(t), s_ref[:, :]))
    o_ref[:, :] = acc


def _ladder_win_kernel(p_ref, s_ref, o_ref):
    """Batched fixed-window (w=4) scalarmult, VMEM-resident.

    Per lane: build the 16-entry multiples table (7 dedicated doubles +
    7 unified adds), then 65 windows of [4 dedicated doubles + 1 unified
    add of the one-hot-selected table entry].  ~2x the binary ladder
    (_ladder_kernel): 260 doubles stay but become 4S+4M each, and 260
    conditional adds collapse to 65.  Same no-dynamic-indexing discipline:
    the scalar tile shifts left 4 bits per window; the digit is always
    limb 19's top nibble; table lookup is a 16-way one-hot select."""
    t = p_ref.shape[1]
    d2 = _const_fe(_D2_LIMBS, t)
    p = p_ref[:, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (L, t), 0)

    tab = [_identity_block(t), p]
    for j in range(2, 16):
        tab.append(_pdbl(tab[j // 2]) if j % 2 == 0
                   else _padd(tab[j - 1], p, d2))

    def body(i, carry):
        acc, s = carry
        dig = (s[L - 1:L, :] >> (W - 4)) & 15          # [1, t]
        acc = _pdbl(_pdbl(_pdbl(_pdbl(acc))))
        addend = tab[0]
        for j in range(1, 16):
            addend = jnp.where(dig == j, tab[j], addend)
        acc = _padd(acc, addend, d2)
        # shift the scalar register left 4 bits (limb carries via roll)
        c = pltpu.roll(s >> (W - 4), shift=1, axis=0)
        c = jnp.where(row == 0, 0, c)
        s = ((s << 4) & MASK) + c
        return acc, s

    acc, _ = jax.lax.fori_loop(
        0, (L * W) // 4, body, (_identity_block(t), s_ref[:, :]))
    o_ref[:, :] = acc


def _seg_scan_kernel(p_ref, h_ref, o_ref, acc_ref):
    """ONE-kernel chunked segmented scan step (grid = depth, sequential on
    TPU): acc lives in VMEM scratch across grid steps, so the whole
    n-point bucket scan runs as a single Mosaic program — no per-step XLA
    scan slicing/dispatch and no accumulator HBM round trips (the round-2
    pipeline paid both, lax.scan of [1024]-batched Pallas adds).

    p: [1, 80, T] block of points (step-major flat-T layout), h: [1, 1, T]
    head flags (1 = this element starts a new segment).  Every element with
    h=0 must follow its predecessor IN THE SAME LANE (chunk layout: lane l
    owns sorted elements [l*depth, (l+1)*depth))."""
    d = pl.program_id(0)
    t = p_ref.shape[2]

    @pl.when(d == 0)
    def _():
        acc_ref[:, :] = _identity_block(t)

    d2 = _const_fe(_D2_LIMBS, t)
    row = p_ref[0]
    h = h_ref[0]                                  # [1, T] int32
    nxt = jnp.where(h > 0, row, _padd(acc_ref[:, :], row, d2))
    o_ref[0] = nxt
    acc_ref[:, :] = nxt


def seg_scan(pt: jax.Array, ht: jax.Array) -> jax.Array:
    """Segmented inclusive scan over the curve monoid, one Pallas kernel.

    pt: [depth, 80, lanes] points (lane l, step j = sorted element
    l*depth + j); ht: [depth, 1, lanes] int32 head flags.  A lane whose
    first element does not start a segment produces chunk-LOCAL partials
    for its leading run — cross-chunk carries are the caller's fixup,
    exactly as in pippenger's chunked scans.  Returns [depth, 80, lanes].
    """
    depth, _, lanes = pt.shape
    return pl.pallas_call(
        _seg_scan_kernel,
        out_shape=jax.ShapeDtypeStruct((depth, 4 * L, lanes), jnp.int32),
        grid=(depth,),
        in_specs=[
            pl.BlockSpec((1, 4 * L, lanes), lambda d: (d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lanes), lambda d: (d, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4 * L, lanes), lambda d: (d, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((4 * L, lanes), jnp.int32)],
        interpret=PF._interpret(),
    )(pt, ht)


def _reduce_kernel(p_ref, o_ref):
    """Reduce a [80, LANES] tile of points to one point (lane 0), log-depth.
    Reference parity: point_accumulate_kernel + shared-memory variant
    (cuda_bulletproof_kernels.cu:45-54, 119-207) — race-free by construction
    (the reference's grid over-provisioning can double-add, SURVEY.md §8.7)."""
    blk = p_ref[:, :]
    m = blk.shape[1]
    while m > 1:
        half = m // 2
        d2 = _const_fe(_D2_LIMBS, half)
        blk = _padd(blk[:, :half], blk[:, half:m], d2)
        m = half
    o_ref[:, :] = jnp.pad(blk, ((0, 0), (0, o_ref.shape[1] - 1)))


# --- public API ----------------------------------------------------------------
def _run_pointwise(kernel, arity, *flats):
    n = flats[0].shape[0]
    nt = max(1, -(-n // LANES))
    npad = nt * LANES
    ins = [_pad_lanes(a, npad) for a in flats]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4 * L, npad), jnp.int32),
        grid=(nt,),
        in_specs=[pl.BlockSpec(
            (a.shape[0], LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
            for a in ins],
        out_specs=pl.BlockSpec((4 * L, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=PF._interpret(),
    )(*ins)
    return out.T[:n]


def add_raw(p: C.GE, q: C.GE) -> C.GE:
    """Fused unified add on GE [n] (un-jitted: inlined by callers)."""
    out = _run_pointwise(_add_kernel, 2, _flatten(p), _flatten(q))
    return _unflatten(out)


def double_raw(p: C.GE) -> C.GE:
    out = _run_pointwise(_double_kernel, 1, _flatten(p))
    return _unflatten(out)


add = jax.jit(add_raw)
double = jax.jit(double_raw)


def scalarmult_raw(p: C.GE, s: jax.Array) -> C.GE:
    """Batched fused ladder: GE [n], scalars [n, 20] -> GE [n].

    Kernel choice via config.PALLAS_LADDER_WINDOW: 4 = fixed-window tableized
    ladder (default, ~2x), 0 = plain binary double-and-add."""
    from .. import config
    kernel = (_ladder_win_kernel if config.PALLAS_LADDER_WINDOW == 4
              else _ladder_kernel)
    n = s.shape[0]
    nt = max(1, -(-n // LANES))
    npad = nt * LANES
    pt = _pad_lanes(_flatten(p), npad, fill=_identity_row())
    st = _pad_lanes(s, npad)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4 * L, npad), jnp.int32),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((4 * L, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4 * L, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=PF._interpret(),
    )(pt, st)
    return _unflatten(out.T[:n])


scalarmult = jax.jit(scalarmult_raw)


def tree_reduce(p: C.GE) -> C.GE:
    """Sum GE [n] -> GE: per-tile in-VMEM log reduction, then an XLA fold of
    the (tiny) per-tile partials."""
    n = p.x.shape[0]
    nt = max(1, -(-n // LANES))
    npad = nt * LANES
    pt = _pad_lanes(_flatten(p), npad, fill=_identity_row())
    out = pl.pallas_call(
        _reduce_kernel,
        out_shape=jax.ShapeDtypeStruct((4 * L, nt * 128), jnp.int32),
        grid=(nt,),
        in_specs=[pl.BlockSpec((4 * L, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((4 * L, 128), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=PF._interpret(),
    )(pt)
    partials = _unflatten(out.T[0::128])          # [nt] points
    if nt == 1:
        return C.GE(*(c[0] for c in partials))
    return C.tree_reduce(partials)


@jax.jit
def msm(points: C.GE, scalars: jax.Array) -> C.GE:
    """Fused-ladder MSM (scalarmult + tile reduction), single dispatch chain.
    Reference parity: cuda_point_vector_multi_scalar_mul
    (cuda_bulletproof_kernels.cu:62-116)."""
    return tree_reduce(scalarmult(points, scalars))
