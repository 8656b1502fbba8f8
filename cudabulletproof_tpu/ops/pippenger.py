"""Pippenger (bucket-method) MSM, TPU-native.

The classic GPU formulation scatter-adds points into buckets — data-dependent
writes that race unless serialized (the reference's closest analog, the
prefix-product kernel at cuda_field_ops.cu:222-254, is literally a
cross-thread race).  The TPU formulation here is fully functional and
race-free by construction:

  per window w of the scalars:
    1. extract w-bit digits (static bit-slicing of the 13-bit limbs)
    2. argsort points by digit (XLA sort)
    3. *segmented* jax.lax.associative_scan with the curve-add monoid over
       (point, segment-head-flag) pairs -> per-digit bucket sums in O(log n)
       depth and ~2n batched curve adds
    4. scatter segment tails into the [2^w] bucket table (unique indices)
    5. bucket-weighted sum  sum_b b*S_b  via a suffix associative_scan
  then Horner-combine windows: acc = 2^w * acc + W_j.

Windows are processed with lax.map so the compiled graph contains ONE window
body.  Cost ~ (2n + 3*2^w) batched curve adds per window; with w=8 and 32
windows this is ~64n + 24k adds per MSM vs ~380n for the ladder MSM — the
win grows with n (use ladder msm for n < ~512).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import curve as C
from . import field as F

SC_BITS = 253


def num_windows(w: int) -> int:
    return -(-SC_BITS // w)


def extract_digits(scalars: jax.Array, w: int) -> jax.Array:
    """[n, 20] 13-bit limbs -> [num_windows, n] w-bit digits (int32)."""
    assert w <= 13
    nw = num_windows(w)
    outs = []
    for j in range(nw):
        start = j * w
        i0, off = start // F.W, start % F.W
        d = scalars[:, i0] >> off
        if off + w > F.W and i0 + 1 < F.L:
            d = d | (scalars[:, i0 + 1] << (F.W - off))
        outs.append(d & ((1 << w) - 1))
    return jnp.stack(outs, axis=0)


def _radix_argsort(digits: jax.Array, w: int) -> jax.Array:
    """Stable argsort of w-bit keys via LSD counting-sort passes.

    Each pass ranks by a MSM_RADIX_BITS-wide sub-key with a [n, radix]
    one-hot cumsum (bandwidth-bound, no comparison network) — an A/B
    alternative to XLA's comparison sort for the bucket partition
    (config.MSM_RADIX_SORT)."""
    from .. import config
    n = digits.shape[0]
    pass_bits = config.MSM_RADIX_BITS

    def one_pass(keys: jax.Array, bits: int, order: jax.Array) -> jax.Array:
        nb = 1 << bits
        k = keys[order]
        onehot = (k[:, None] == jnp.arange(nb, dtype=k.dtype)[None, :])
        within = jnp.cumsum(onehot.astype(jnp.int32), axis=0)
        counts = within[-1]                          # [nb]
        starts = jnp.cumsum(counts) - counts         # exclusive prefix
        rank = starts[k] + jnp.take_along_axis(
            within, k[:, None], axis=1)[:, 0] - 1
        return jnp.zeros((n,), order.dtype).at[rank].set(order)

    order = jnp.arange(n, dtype=jnp.int32)
    shift = 0
    while shift < w:
        bits = min(pass_bits, w - shift)
        order = one_pass((digits >> shift) & ((1 << bits) - 1), bits, order)
        shift += bits
    return order


def _seg_combine(left, right):
    """Segmented-scan monoid over (point, head_flag)."""
    (pv, pf) = left
    (qv, qf) = right
    merged = C.add(pv, qv)
    out = C.select(qf, qv, merged)
    return out, jnp.logical_or(pf, qf)


def _bucket_window(points: C.GE, digits: jax.Array, w: int) -> C.GE:
    """Bucket-accumulate one window; returns the window's weighted sum."""
    from .. import config
    n = digits.shape[0]
    nb = 1 << w
    if config.MSM_RADIX_SORT:
        order = _radix_argsort(digits, w)
    else:
        order = jnp.argsort(digits)
    d_sorted = digits[order]
    p_sorted = C.GE(*(c[order] for c in points))
    head = jnp.concatenate([jnp.ones((1,), bool),
                            d_sorted[1:] != d_sorted[:-1]])
    vals, _ = jax.lax.associative_scan(_seg_combine, (p_sorted, head), axis=0)
    tail = jnp.concatenate([head[1:], jnp.ones((1,), bool)])
    # scatter segment tails: each present digit has exactly one tail index;
    # everything else lands in the discard slot nb.
    idx = jnp.where(tail, d_sorted, nb)
    buckets = C.identity((nb + 1,))
    buckets = C.GE(*(bc.at[idx].set(vc) for bc, vc in zip(buckets, vals)))
    # weighted sum over buckets 1..nb-1:  sum_b b*S_b = sum_b suffix_b
    body = C.GE(*(bc[1:nb][::-1] for bc in buckets))
    suffix = jax.lax.associative_scan(C.add, body, axis=0)
    return C.tree_reduce(suffix)


@functools.partial(jax.jit, static_argnames=("w",))
def msm_pippenger(points: C.GE, scalars: jax.Array, w: int = 8) -> C.GE:
    """sum_i scalars[i] * points[i] via bucket method.

    points: GE [n]; scalars: [n, 20] radix-2^13 limbs (< 2^253).
    Reference parity target: the MSM role of
    cuda_point_vector_multi_scalar_mul (cuda_bulletproof_kernels.cu:62-116),
    rebuilt as a scaling bucket kernel instead of per-point ladders.
    """
    digits = extract_digits(scalars, w)          # [nw, n]
    from .. import config
    if config.MSM_VMAP_WINDOWS:
        # all windows in one batched program: the sort and the segmented scan
        # are O(n) with a large per-stage dispatch overhead, which batching
        # over the window axis amortizes ~nw-fold
        window_sums = jax.vmap(
            lambda d: _bucket_window(points, d, w))(digits)  # GE [nw]
    else:
        window_sums = jax.lax.map(
            lambda d: _bucket_window(points, d, w), digits)   # GE [nw]

    nw = num_windows(w)

    def horner(j, acc):
        idx = nw - 1 - j
        acc = jax.lax.fori_loop(0, w, lambda _, a: C.double(a), acc)
        return C.add(acc, C.GE(*(c[idx] for c in window_sums)))

    # identity derived from varying data: required under shard_map
    init = C.identity_like(C.GE(*(c[0] for c in window_sums)))
    return jax.lax.fori_loop(0, nw, horner, init)
