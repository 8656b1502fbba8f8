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


def _seg_scan_kernel(p_ref, h_ref, o_ref, c_ref, acc_ref, hh_ref, *,
                     depth: int, lanes: int):
    """ONE-kernel chunked segmented scan step (grid = depth, sequential on
    TPU): acc lives in VMEM scratch across grid steps, so the whole
    n-point bucket scan runs as a single Mosaic program — no per-step XLA
    scan slicing/dispatch and no accumulator HBM round trips (the round-2
    pipeline paid both, lax.scan of [1024]-batched Pallas adds).

    p: [1, 80, T] block of points (step-major flat-T layout), h: [1, 1, T]
    head flags (1 = this element starts a new segment).  Every element with
    h=0 must follow its predecessor IN THE SAME LANE (chunk layout: lane l
    owns sorted elements [l*depth, (l+1)*depth)).

    Second output c: [80, lanes] per-lane cross-chunk CARRY — the exclusive
    segmented combine of the per-lane trailing values across lanes (what the
    caller previously computed with a 10-stage XLA associative_scan; the
    round-3 stage profile showed those glue stages dominating window time).
    """
    d = pl.program_id(0)
    raw = p_ref.shape[1] != 4 * L                 # [1, lanes, 80] blocks
    t = p_ref.shape[1] if raw else p_ref.shape[2]

    @pl.when(d == 0)
    def _():
        acc_ref[:, :] = _identity_block(t)
        hh_ref[:, :] = jnp.zeros_like(hh_ref)

    d2 = _const_fe(_D2_LIMBS, t)
    # raw layout: the gather's natural [lanes, 80] block is transposed to
    # compute layout IN VMEM (overlapped with the sequential scan), so the
    # caller never pays the 21 MB XLA relayouts on either side (round-3
    # stage profile: those were ~40% of window time)
    row = jnp.transpose(p_ref[0]) if raw else p_ref[0]
    h = h_ref[0]                                  # [1, T] int32
    nxt = jnp.where(h > 0, row, _padd(acc_ref[:, :], row, d2))
    o_ref[0] = jnp.transpose(nxt) if raw else nxt
    acc_ref[:, :] = nxt
    hh_ref[:, :] = jnp.maximum(hh_ref[:, :], h)

    @pl.when(d == depth - 1)
    def _():
        S, _ = _lane_scan_incl(acc_ref[:, :], lanes,
                               seg_flags=hh_ref[:, :])
        lane = _lane_iota(S.shape)
        carry = pltpu.roll(S, shift=1, axis=1)
        carry = jnp.where(lane == 0, _identity_block(t), carry)
        c_ref[:, :] = jnp.transpose(carry) if raw else carry


def seg_scan(pt: jax.Array, ht: jax.Array):
    """Segmented inclusive scan over the curve monoid, one Pallas kernel.

    pt: [depth, 80, lanes] points (lane l, step j = sorted element
    l*depth + j); ht: [depth, 1, lanes] int32 head flags.  A lane whose
    first element does not start a segment produces chunk-LOCAL partials
    for its leading run.  Returns ([depth, 80, lanes] scan values,
    [80, lanes] per-lane cross-chunk carries) — the carry for lane l is the
    segmented combine of trailing values of lanes < l, computed in-VMEM
    (see _seg_scan_kernel)."""
    depth, _, lanes = pt.shape
    return pl.pallas_call(
        functools.partial(_seg_scan_kernel, depth=depth, lanes=lanes),
        out_shape=[PF.sds((depth, 4 * L, lanes), jnp.int32, pt, ht),
                   PF.sds((4 * L, lanes), jnp.int32, pt, ht)],
        grid=(depth,),
        in_specs=[
            pl.BlockSpec((1, 4 * L, lanes), lambda d: (d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lanes), lambda d: (d, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, 4 * L, lanes), lambda d: (d, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((4 * L, lanes), lambda d: (0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((4 * L, lanes), jnp.int32),
                        pltpu.VMEM((1, lanes), jnp.int32)],
        interpret=PF._interpret(),
    )(pt, ht)


def seg_scan_raw(pt_raw: jax.Array, ht: jax.Array):
    """seg_scan consuming/producing the gather-natural layout: pt_raw
    [depth, lanes, 80] (points on sublanes, flattened coordinates minor) —
    the in-VMEM transpose to compute layout happens inside the kernel.
    Returns ([depth, lanes, 80] scan values, [lanes, 80] carries)."""
    depth, lanes, _ = pt_raw.shape
    return pl.pallas_call(
        functools.partial(_seg_scan_kernel, depth=depth, lanes=lanes),
        out_shape=[PF.sds((depth, lanes, 4 * L), jnp.int32, pt_raw, ht),
                   PF.sds((lanes, 4 * L), jnp.int32, pt_raw, ht)],
        grid=(depth,),
        in_specs=[
            pl.BlockSpec((1, lanes, 4 * L), lambda d: (d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lanes), lambda d: (d, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, lanes, 4 * L), lambda d: (d, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((lanes, 4 * L), lambda d: (0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((4 * L, lanes), jnp.int32),
                        pltpu.VMEM((1, lanes), jnp.int32)],
        interpret=PF._interpret(),
    )(pt_raw, ht)


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _lane_scan_incl(v, lanes: int, seg_flags=None):
    """In-VMEM Hillis-Steele inclusive scan ACROSS LANES of a [80, lanes]
    point block (optionally segmented by seg_flags [1, lanes]): log2(lanes)
    stages of roll+masked-add, zero XLA stages.  Replaces the XLA
    associative_scan carry fixups whose per-stage relayouts dominated the
    bucket pipeline (round-3 stage profile: ~3.9 ms/window of glue vs
    1.1 ms of scan math)."""
    t = v.shape[1]
    d2 = _const_fe(_D2_LIMBS, t)
    lane = _lane_iota(v.shape)
    f = seg_flags                         # [1, lanes] int32 or None
    s = 1
    while s < lanes:
        lv = pltpu.roll(v, shift=s, axis=1)
        merged = _padd(lv, v, d2)
        if f is not None:
            # left operand exists only for lane >= s; segmented: keep v
            # where this position's run already starts a segment (f == 1)
            lf = pltpu.roll(f, shift=s, axis=1)
            v = jnp.where(jnp.logical_and(lane >= s, f == 0), merged, v)
            f = jnp.where(_lane_iota(f.shape) >= s, jnp.maximum(f, lf), f)
        else:
            v = jnp.where(lane >= s, merged, v)
        s *= 2
    return v, f


def _bucket_fold_kernel(p_ref, o_ref, sacc_ref, wacc_ref, *, depth: int,
                        lanes: int):
    """ONE-kernel bucket-weighted suffix fold: sum_b b*S_b over a bucket
    table fed in DESCENDING bucket order, identity-padded at the front.

    Layout: element (step j, lane l) = padded_body[l*depth + j]; per step
    the kernel advances each lane's local prefix (sacc) and accumulates the
    prefix into wacc (so wacc_l = sum over the chunk of its local prefixes).
    At the last step: chunk carries via an in-VMEM cross-lane scan, scaled
    by `depth` with log2(depth) dedicated doublings, added to wacc, and the
    lane dimension reduced in-VMEM — the whole suffix fold is one Mosaic
    program with NO XLA point-op stages (the previous pipeline spent
    ~10 associative_scan stages + ~13 tree-reduce stages here)."""
    d = pl.program_id(0)
    t = p_ref.shape[2]

    @pl.when(d == 0)
    def _():
        sacc_ref[:, :] = _identity_block(t)
        wacc_ref[:, :] = _identity_block(t)

    d2 = _const_fe(_D2_LIMBS, t)
    s = _padd(sacc_ref[:, :], p_ref[0], d2)
    sacc_ref[:, :] = s
    wacc_ref[:, :] = _padd(wacc_ref[:, :], s, d2)

    @pl.when(d == depth - 1)
    def _():
        incl, _ = _lane_scan_incl(sacc_ref[:, :], lanes)
        lane = _lane_iota(incl.shape)
        excl = pltpu.roll(incl, shift=1, axis=1)
        excl = jnp.where(lane == 0, _identity_block(t), excl)
        k = depth
        while k > 1:                      # carry * depth (depth = 2^j)
            excl = _pdbl(excl)
            k //= 2
        r = _padd(wacc_ref[:, :], excl, d2)
        m = lanes
        while m > 1:                      # in-VMEM lane reduction
            half = m // 2
            dh = _const_fe(_D2_LIMBS, half)
            r = _padd(r[:, :half], r[:, half:m], dh)
            m = half
        o_ref[:, :] = jnp.pad(r, ((0, 0), (0, o_ref.shape[1] - 1)))


def bucket_fold(body_flat: jax.Array, lanes: int = 128) -> jax.Array:
    """sum_p prefix(p) over a [m, 80] flat point array (descending bucket
    order), i.e. sum_b b*S_b when body = buckets[1:nb] reversed.  m is
    identity-padded AT THE FRONT to a multiple of `lanes` (front padding
    contributes identity to every prefix).  Returns [80] (one point)."""
    m = body_flat.shape[0]
    depth = -(-m // lanes)
    while depth & (depth - 1):            # carry scaling needs depth = 2^k
        depth += 1
    pad = depth * lanes - m
    if pad:
        idrow = jnp.asarray(_identity_row())
        body_flat = jnp.concatenate(
            [jnp.broadcast_to(idrow, (pad, 4 * L)), body_flat], axis=0)
    # (j, l) = body[l*depth + j]
    pt = body_flat.reshape(lanes, depth, 4 * L).transpose(1, 2, 0)
    out = pl.pallas_call(
        functools.partial(_bucket_fold_kernel, depth=depth, lanes=lanes),
        out_shape=PF.sds((4 * L, lanes), jnp.int32, pt),
        grid=(depth,),
        in_specs=[pl.BlockSpec((1, 4 * L, lanes), lambda d: (d, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((4 * L, lanes), lambda d: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((4 * L, lanes), jnp.int32),
                        pltpu.VMEM((4 * L, lanes), jnp.int32)],
        interpret=PF._interpret(),
    )(pt)
    return out[:, 0]


def _madd(p, ypx2, ymx2, td2):
    """Mixed add: extended accumulator + precomputed Z2=1 point given as
    (y2+x2, y2-x2, 2d*t2).  Same add-2008-hwcd-3 formula as _padd with
    zz = z1*z2 collapsed to z1 and d2*t2 folded into the precomputation:
    7 field muls vs the unified add's 9 (ref10 ge_madd shape).  Complete on
    the prime-order subgroup, so acc == Q and acc == identity need no
    branches."""
    x1, y1, z1, t1 = p[0:L], p[L:2 * L], p[2 * L:3 * L], p[3 * L:4 * L]
    a = _fmul(_fsub(y1, x1), ymx2)
    b = _fmul(_fadd(y1, x1), ypx2)
    c = _fmul(t1, td2)
    d = _fadd(z1, z1)
    e = _fsub(b, a)
    f = _fsub(d, c)
    g = _fadd(d, c)
    h = _fadd(b, a)
    return jnp.concatenate(
        [_fmul(e, f), _fmul(g, h), _fmul(f, g), _fmul(e, h)], axis=0)


def _bucket_accum_kernel(p_ref, d_ref, o_ref, sacc_ref, hacc_ref, *,
                         nb: int, steps: int, lanes: int, unroll: int,
                         w: int, nw: int):
    """Zero-shuffle SIGNED-bucket MSM window: points stream in NATURAL order;
    all nb bucket accumulators live in VMEM scratch; each step select-adds
    every lane's point into its |digit|'s bucket (one mixed 7M add + ~2*nb
    one-op lane-masked selects).  No sort, no [n]-row gather, no bucket
    scatter, no carry fixup — the round-3 stage profile showed those (not
    math) were ~75% of window time, and the gather is per-index bound
    (~47 ns/row regardless of row bytes; benchmarks/bench_gather.py).

    Round-4 structure (vs the round-3 first cut):
      * SIGNED digits in [-2^(w-1), 2^(w-1)] halve the bucket count (and so
        the select/write-back chains) for the same window width; negation of
        a precomputed point is a 3-select swap (ypx<->ymx, td2 -> -td2,
        streamed as a 4th row group so no in-kernel field negate).
      * The streamed points are PRECOMPUTED mixed-add operands
        (y+x | y-x | 2d*t | -2d*t, Z=1), cutting the hot add 9M -> 7M.
      * `unroll` points per lane per grid step amortize the fixed Mosaic
        per-step overhead (measured ~5.2 us/step, bench_addrate.py).

    Grid (windows, steps), steps innermost.  Per step, per unroll slot:
      m         = |d|;  q_signed = sign-select of the precomp rows
      acc_sel[l] = sacc[m[l]]          (static-index select chain)
      added      = madd(acc_sel, q)    (ONE [*,lanes]-wide mixed add)
      sacc[b]    = where(m==b, added)  (write-back select chain)
    Digit 0 lanes select bucket slot 0's accumulator but the write-back
    skips slot 0, so they add nothing.  At each window's last step the
    weighted fold sum_b b*S_b runs in-kernel (sequential suffix+total loop
    over buckets, lane-parallel, then lane-halving down to 128), and the
    HORNER window combine acc = 2^w*acc + W_window ALSO runs in-kernel on a
    [80, 128] accumulator (windows stream most-significant first) — the
    round-4 glue profile measured the XLA single-point Horner at ~64 ms for
    65 windows, i.e. MORE than the whole kernel; in-kernel it is ~5 narrow
    ops per window.  The kernel's single output is the finished MSM result
    (lane 0)."""
    wd = pl.program_id(0)
    j = pl.program_id(1)
    t = lanes
    hc = hacc_ref.shape[1]

    @pl.when(j == 0)
    def _():
        sacc_ref[:, :, :] = jnp.broadcast_to(
            _identity_block(t)[None], (nb, 4 * L, t))

    dall = d_ref[0, 0]                            # [unroll, lanes] int32
    for u in range(unroll):
        d = dall[u:u + 1, :]                      # [1, lanes], signed
        q = p_ref[0, u]                           # [80, lanes] precomp
        neg = d < 0
        m = jnp.where(neg, -d, d)
        ypx = jnp.where(neg, q[L:2 * L], q[0:L])
        ymx = jnp.where(neg, q[0:L], q[L:2 * L])
        td2 = jnp.where(neg, q[3 * L:4 * L], q[2 * L:3 * L])
        # unrolled static-index select/write-back chains: dynamic-index
        # fori_loops forced per-iteration dynamic VMEM addressing (measured
        # ~45% over the cost model); static slots compile to plain vselects
        acc_sel = sacc_ref[1] if nb > 1 else sacc_ref[0]
        for b in range(2, nb):
            acc_sel = jnp.where(m == b, sacc_ref[b], acc_sel)
        added = _madd(acc_sel, ypx, ymx, td2)
        for b in range(1, nb):                    # digit 0 writes nothing
            sacc_ref[b] = jnp.where(m == b, added, sacc_ref[b])

    @pl.when(j == steps - 1)
    def _():
        d2 = _const_fe(_D2_LIMBS, t)
        idb = _identity_block(t)

        # fori_loop with a DYNAMIC scratch index on purpose: unrolling this
        # into static sacc_ref[b] loads makes Mosaic's vector-layout pass
        # abort inside the scf.if region (Check failed: limits[i] <= dim(i),
        # reproduced 2026-08-19; benchmarks/_repro_accum3.py variants) — and
        # the fold is 2*(nb-1) adds once per window, not the hot path.
        def fold_body(k, carry):
            suf, tot = carry
            b = nb - 1 - k                        # nb-1 down to 1
            suf = _padd(suf, sacc_ref[b], d2)
            tot = _padd(tot, suf, d2)
            return suf, tot

        _, total = jax.lax.fori_loop(0, nb - 1, fold_body, (idb, idb))
        m = lanes
        while m > hc:
            half = m // 2
            dh = _const_fe(_D2_LIMBS, half)
            total = _padd(total[:, :half], total[:, half:m], dh)
            m = half
        # in-kernel Horner on the [80, hc] partials: doubling and addition
        # both distribute over the pending lane reduction, so the window
        # combine runs at hc lanes and the final halving happens once
        dh = _const_fe(_D2_LIMBS, hc)
        prev = jnp.where(wd == 0, _identity_block(hc), hacc_ref[:, :])
        for _ in range(w):
            prev = _pdbl(prev)
        hacc_ref[:, :] = _padd(prev, total, dh)

    @pl.when(jnp.logical_and(j == steps - 1, wd == nw - 1))
    def _():
        r = hacc_ref[:, :]
        m = hc
        while m > 1:
            half = m // 2
            dh = _const_fe(_D2_LIMBS, half)
            r = _padd(r[:, :half], r[:, half:m], dh)
            m = half
        o_ref[:, :] = jnp.pad(r, ((0, 0), (0, o_ref.shape[1] - 1)))


def msm_bucket_accum(pt: jax.Array, dg: jax.Array, nb: int,
                     w: int) -> jax.Array:
    """The WHOLE Pippenger MSM (all windows + Horner combine) as ONE Mosaic
    program.

    pt: [steps, unroll, 80, lanes] PRECOMPUTED points in natural order
    (point (j*unroll + u)*lanes + l at (j, u, :, l); rows y+x | y-x | 2d*t |
    -2d*t, Z=1 — see pippenger.madd_precomp); dg: [nw, steps, unroll, lanes]
    SIGNED digits in [-(nb-1), nb-1] (0 = skip), rows ordered MOST-significant
    window first.  Returns [80, hc] with the finished MSM in lane 0."""
    steps, unroll, _, lanes = pt.shape
    nw = dg.shape[0]
    hc = min(lanes, 128)
    return pl.pallas_call(
        functools.partial(_bucket_accum_kernel, nb=nb, steps=steps,
                          lanes=lanes, unroll=unroll, w=w, nw=nw),
        out_shape=PF.sds((4 * L, hc), jnp.int32, pt, dg),
        grid=(nw, steps),
        in_specs=[
            pl.BlockSpec((1, unroll, 4 * L, lanes), lambda w, j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, unroll, lanes), lambda w, j: (w, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4 * L, hc), lambda w, j: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nb, 4 * L, lanes), jnp.int32),
                        pltpu.VMEM((4 * L, hc), jnp.int32)],
        interpret=PF._interpret(),
    )(pt, dg)


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
        out_shape=PF.sds((4 * L, npad), jnp.int32, *ins),
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
        out_shape=PF.sds((4 * L, npad), jnp.int32, pt, st),
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
        out_shape=PF.sds((4 * L, nt * 128), jnp.int32, pt),
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
