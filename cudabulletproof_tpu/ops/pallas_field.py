"""Pallas TPU kernels for batched fe25519 ops (mul/sq/add/sub/inner-product).

Native-kernel parity with the reference's CUDA acceleration layer (§2.5 of
SURVEY.md):
  batch_field_{add,sub,mul}_kernel  (cuda_field_ops.cu:37-70)   -> add/sub/mul
  karatsuba_field_mul_kernel        (cuda_field_ops.cu:73-144)  -> mul
  field_square_kernel               (cuda_field_ops.cu:147-219, which drops
      carries at cu:174-182)                                    -> sq (exact)
  field_vector_inner_product_kernel (cuda_inner_product.cu:33-94) -> inner_product

Kernel design (TPU-first, not a translation):
  * In-kernel layout is [limbs=20, batch_tile]: limbs on sublanes, batch on
    lanes, so every limb op is a full-width VPU op over the tile (the SoA
    layout the reference only experiments with, cuda_field_ops.cu:486-518, is
    the *only* layout here).
  * Schoolbook convolution is 20 shifted multiply-adds on [20, T] blocks;
    all partials provably fit int32 (see ops/field.py radix discussion).
  * Carry propagation is a *parallel carry relaxation*: t <- (t & MASK) +
    roll(t >> 13), with the limb-19 carry folded into limb 0 times 608
    (2^260 == 608 mod p).  From conv bounds (< 1.52e9) five passes provably
    reach limbs <= 2^13 + 608 (a run of 8191-limbs can keep a +1 carry alive,
    so strict < 2^13 would need a sequential chain) — this *relaxed weak
    normalization* is closed under all kernels here: the convolution bound
    with limbs <= 8800 is 20 * 8800^2 = 1.55e9, still < 2^31.  Equality
    tests therefore compare values mod p / canonical bytes, not raw limbs.
  * The inner-product kernel reduces each tile's per-lane convolution
    coefficients over lanes with a lo/hi split (exact in int32), accumulating
    into per-tile columns of a [39, 256] partial block; the final cross-tile
    combine re-expands the splits as limb-shifted contributions. Exact for
    n <= 2^17 elements (asserted).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import field as F

LANES = 256          # batch tile (lanes); multiple of 128

def _interpret() -> bool:
    # Pallas compiles natively on TPU; everywhere else run the interpreter
    # (this is how the CPU test suite exercises kernel semantics bit-exactly)
    import jax
    return jax.default_backend() != "tpu"

L = F.L
MASK = F.MASK
W = F.W
FOLD = F.FOLD


def _fold_roll(c):
    """Roll carries up one limb; carry out of limb 19 re-enters limb 0 * 608."""
    rolled = pltpu.roll(c, shift=1, axis=0)
    row0 = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 0) == 0
    return jnp.where(row0, rolled * FOLD, rolled)


def _carry_relax(t, passes: int):
    for _ in range(passes):
        t = (t & MASK) + _fold_roll(t >> W)
    return t


def _fold_wide(acc):
    """[m, ...] conv coefficients (limbs on axis 0) -> [20, ...];
    coefficient at position 20+j folds to j (lo*608) and j+1 (hi*608)."""
    while acc.shape[0] > L:
        main, top = acc[:L], acc[L:]
        k = top.shape[0]
        wn = max(L, k + 1)
        if wn > L:
            main = jnp.concatenate(
                [main, jnp.zeros((wn - L,) + acc.shape[1:], jnp.int32)], axis=0)
        main = main.at[0:k].add(FOLD * (top & MASK))
        main = main.at[1:k + 1].add(FOLD * (top >> W))
        acc = main
    return acc


def _conv_fold(a, b):
    """[20, T] x [20, T] -> [20, T] weakly-normalized product."""
    T = a.shape[1]
    acc = jnp.zeros((2 * L - 1, T), dtype=jnp.int32)
    for i in range(L):
        acc = acc.at[i:i + L].add(a[i, :][None, :] * b)
    return _carry_relax(_fold_wide(acc), 5)


def _mul_kernel(a_ref, b_ref, o_ref):
    o_ref[:, :] = _conv_fold(a_ref[:, :], b_ref[:, :])


def _sq_kernel(a_ref, o_ref):
    a = a_ref[:, :]
    o_ref[:, :] = _conv_fold(a, a)


def _add_kernel(a_ref, b_ref, o_ref):
    o_ref[:, :] = _carry_relax(a_ref[:, :] + b_ref[:, :], 3)


def _sub_kernel(a_ref, b_ref, o_ref):
    # K = the additive complement from field.py, built from scalars in-kernel
    # (Pallas kernels cannot capture array constants)
    row = jax.lax.broadcasted_iota(jnp.int32, b_ref.shape, 0)
    k = jnp.where(row == 0, int(F._K_NEG[0]), int(F._K_NEG[1]))
    o_ref[:, :] = _carry_relax(a_ref[:, :] + (k - b_ref[:, :]), 3)


def _pad_to(x, n):
    if x.shape[0] == n:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((n - x.shape[0],) + x.shape[1:], x.dtype)], axis=0)


def _run_elementwise(kernel, arity, *args):
    """args: [n, 20] arrays -> [n, 20] via tiled [20, T] Pallas kernel."""
    n = args[0].shape[0]
    nt = max(1, -(-n // LANES))
    npad = nt * LANES
    ins = [_pad_to(a, npad).T for a in args]     # [20, npad]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, npad), jnp.int32),
        grid=(nt,),
        in_specs=[pl.BlockSpec((L, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] * arity,
        out_specs=pl.BlockSpec((L, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(*ins)
    return out.T[:n]


@jax.jit
def mul(a, b):
    return _run_elementwise(_mul_kernel, 2, a, b)


@jax.jit
def add(a, b):
    return _run_elementwise(_add_kernel, 2, a, b)


@jax.jit
def sub(a, b):
    return _run_elementwise(_sub_kernel, 2, a, b)


@jax.jit
def sq(a):
    return _run_elementwise(_sq_kernel, 1, a)


def _inner_product_kernel(a_ref, b_ref, o_ref):
    """Per-tile: conv coefficients per lane, lo/hi-split lane reduction,
    accumulated into column (step % 128) of the [39, 256] partial block."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        o_ref[:, :] = jnp.zeros_like(o_ref)

    a = a_ref[:, :]
    b = b_ref[:, :]
    T = a.shape[1]
    acc = jnp.zeros((2 * L - 1, T), dtype=jnp.int32)
    for i in range(L):
        acc = acc.at[i:i + L].add(a[i, :][None, :] * b)
    # per-lane coefficients < 1.35e9; split before the lane reduction:
    lo_sum = jnp.sum(acc & MASK, axis=1, keepdims=True)    # < 2^13 * 256 = 2^21
    hi_sum = jnp.sum(acc >> W, axis=1, keepdims=True)      # < 2^18 * 256 = 2^26
    col = step % 128
    o_ref[:, pl.ds(col, 1)] += lo_sum
    o_ref[:, pl.ds(128 + col, 1)] += hi_sum


@jax.jit
def inner_product(a, b):
    """<a, b> mod p over [n, 20] batches -> weakly-normalized [20].

    Exact for n <= 2^17 (cross-tile accumulators stay < 2^31).
    Reference parity: cuda_field_vector_inner_product
    (cuda_inner_product.cu:97-216)."""
    n = a.shape[0]
    assert n <= (1 << 17), "inner_product: n too large for exact int32 accum"
    nt = max(1, -(-n // LANES))
    npad = nt * LANES
    at = _pad_to(a, npad).T
    bt = _pad_to(b, npad).T
    partial = pl.pallas_call(
        _inner_product_kernel,
        out_shape=jax.ShapeDtypeStruct((2 * L - 1, 256), jnp.int32),
        grid=(nt,),
        in_specs=[pl.BlockSpec((L, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((2 * L - 1, 256), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(at, bt)
    s_lo, s_hi = partial[:, :128], partial[:, 128:]
    # exact cross-column combine: re-expand hi as limb-shifted contributions
    s0 = jnp.sum(s_lo, axis=1)                   # coeff k, limb offset 0
    h0 = jnp.sum(s_hi & MASK, axis=1)            # coeff k, limb offset +1
    h1 = jnp.sum(s_hi >> W, axis=1)              # coeff k, limb offset +2
    m = 2 * L + 1
    t = jnp.zeros((m, 1), dtype=jnp.int32)
    t = t.at[0:2 * L - 1, 0].add(s0)
    t = t.at[1:2 * L, 0].add(h0)
    t = t.at[2:2 * L + 1, 0].add(h1)
    folded = _fold_wide(t)[:, 0]                 # [20]
    return F.normalize_weak(folded[None])[0]
