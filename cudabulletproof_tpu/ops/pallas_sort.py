"""Pallas counting-rank: the bucket-partition kernel that replaces argsort.

Why: the Pippenger pipeline only needs points GROUPED by w-bit digit, yet
round 1 paid jnp.argsort for it — ~6.5 of 7.9 ms/window at 2^16 and ~85 of
105 ms/window at 2^20 (NOTES.md bottleneck map; VERDICT round-1 item 2).  An
LSD counting sort needs exactly two things per pass: a histogram and a
stable rank — both are one-hot accumulations that XLA must materialize as
an [n, radix] tensor (measured slower than argsort, NOTES.md item 0b) but a
Pallas kernel keeps in a VMEM-resident [radix, 8, 128] counter block,
touching each key once.  The only XLA-side work left per pass is one [n]
gather and one [n] scatter of int32 indices.

Traversal-order convention (the crux of multi-pass stability): counters are
kept per (sublane s, lane l), so a pass visits keys in (s, l, block t)
order.  We therefore DEFINE element positions between passes as
p(t, s, l) = (s*128 + l)*nblk + t; ranks are positions in that same
convention, scatters use them as linear indices, and the next pass's block
layout is rebuilt with a reshape+transpose.  Within a pass the counting
rank is stable w.r.t. this traversal by construction, which is exactly the
LSD requirement.

Reference analog: the reference has no partition at all (its MSM ladders
every point, cuda_bulletproof_kernels.cu:26-42); this kernel is what makes
the bucket method's data movement TPU-shaped.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_field as PF

_SUB, _LN = 8, 128
_BLOCK = _SUB * _LN                     # 1024 keys per grid step


def _hist_kernel(radix):
    def kernel(keys_ref, cnt_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _zero():
            cnt_ref[...] = jnp.zeros_like(cnt_ref)

        k = keys_ref[0]                              # [8, 128]
        for b in range(radix):
            cnt_ref[b] += (k == b).astype(jnp.int32)

    return kernel


def _rank_kernel(radix):
    def kernel(keys_ref, base_ref, rank_ref, cnt_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            cnt_ref[...] = base_ref[...]

        k = keys_ref[0]
        r = jnp.zeros((_SUB, _LN), jnp.int32)
        for b in range(radix):
            hit = k == b
            r = jnp.where(hit, cnt_ref[b], r)
            cnt_ref[b] += hit.astype(jnp.int32)
        rank_ref[0] = r

    return kernel


def _pass_rank(keys_blk: jax.Array, radix: int) -> jax.Array:
    """keys_blk [nblk, 8, 128] (values < radix) -> rank [nblk, 8, 128]:
    each key's final position among equal keys, grouped ascending, stable in
    (s, l, t) traversal order."""
    nblk = keys_blk.shape[0]
    counts = pl.pallas_call(
        _hist_kernel(radix),
        out_shape=PF.sds((radix, _SUB, _LN), jnp.int32, keys_blk),
        grid=(nblk,),
        in_specs=[pl.BlockSpec((1, _SUB, _LN), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((radix, _SUB, _LN), lambda t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=PF._interpret(),
    )(keys_blk)
    # base[b, s, l] = exclusive prefix over (b, s, l)-flattened totals —
    # start of that counter's key-run in the output ordering
    flat = counts.reshape(-1)
    base = (jnp.cumsum(flat) - flat).reshape(radix, _SUB, _LN).astype(jnp.int32)
    return pl.pallas_call(
        _rank_kernel(radix),
        out_shape=PF.sds((nblk, _SUB, _LN), jnp.int32, keys_blk, base),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, _SUB, _LN), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((radix, _SUB, _LN), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _SUB, _LN), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((radix, _SUB, _LN), jnp.int32)],
        interpret=PF._interpret(),
    )(keys_blk, base)


def _to_blocks(lin: jax.Array, nblk: int) -> jax.Array:
    """Linear positions p = (s*128 + l)*nblk + t  ->  [nblk, 8, 128]."""
    return lin.reshape(_SUB, _LN, nblk).transpose(2, 0, 1)


def _plan_passes(w: int, pass_bits: int):
    out = []
    done = 0
    while done < w:
        out.append((done, min(pass_bits, w - done)))
        done += out[-1][1]
    return out


@functools.partial(jax.jit, static_argnames=("w", "pass_bits"))
def grouping_order(digits: jax.Array, w: int, pass_bits: int = 7) -> jax.Array:
    """Permutation `order` such that digits[order] is grouped by value
    ascending (the bucket pipeline's only requirement from its sort).

    digits: int32 [n], values < 2^w; n must be a multiple of 1024.
    LSD passes of `pass_bits` each; per pass one histogram + one rank Pallas
    kernel and one [n] scatter."""
    n = digits.shape[0]
    assert n % _BLOCK == 0, n
    # radix > 2^8 means >256 unrolled counter updates per block and >1 MB of
    # VMEM counters — never the right trade; multi-pass instead
    assert 1 <= pass_bits <= 8, pass_bits
    nblk = n // _BLOCK
    order = _to_blocks(jnp.arange(n, dtype=jnp.int32), nblk)
    for (shift, bits) in _plan_passes(w, pass_bits):
        keys = (digits[order] >> shift) & ((1 << bits) - 1)
        rank = _pass_rank(keys, 1 << bits)
        lin = jnp.zeros((n,), jnp.int32).at[rank.reshape(-1)].set(
            order.reshape(-1), unique_indices=True)
        order = _to_blocks(lin, nblk)
    # return in plain linear (grouped) order
    return order.transpose(1, 2, 0).reshape(-1)
