"""EXPERIMENTAL: radix-2^16 field representation (16 x 16-bit int32 limbs).

Round-4 NOTES.md identified the limb radix as the last representational
lever on the field-mul issue bound: 20x13-bit limbs cost a 400-product
convolution plus 5 carry-relax passes; 16x16-bit limbs shrink the conv to
256 limb products and (with the wider 2^16 relax window) need only 3 relax
passes.  The catch this module exists to measure: the TPU VPU has no
32x32->hi multiply, and a 16x16-bit product (< 2^32) does NOT fit signed
int32 — so one operand must be pre-split into 8-bit halves and the conv
accumulated in two int32 banks (A: a x b_lo, B: a x b_hi, recombined as
A + 2^8 B during carry folding).  That doubles the scalar product count to
512 — but every per-limb operation here is a whole-[L,T]-tensor op, and the
radix-16 tensors are 16 sublane rows (2 sublane tiles/vreg column) vs the
radix-13 path's 20-39 rows, so the *vreg-weighted* op counts land within
~15% of each other.  benchmarks/bench_radix16.py A/Bs the two kernels on
hardware; the ruling lives in NOTES.md.

Representation: value = sum(limb[i] * 2^(16 i), i < 16), limbs int32,
weakly normalized to limb <= 2^16 + 38 (the same weak-normal discipline as
ops/field.py).  2^256 = 38 (mod p) is the wrap factor (2^255 = 19).

Reference parity target: the batch field-op role of
/root/reference/cuda_field_ops.cu:73-144 (fe25519 mul/sq device kernels) —
rebuilt as Pallas VMEM kernels at a different radix.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import field as F
from .pallas_field import sds, _interpret, LANES

L16 = 16
W16 = 16
MASK16 = (1 << 16) - 1
FOLD16 = 38          # 2^256 mod p

P_INT = (1 << 255) - 19


# --- host-side conversions (exact, python-int round trip) -------------------
def to_int(limbs) -> int:
    """[16] int32 limbs -> python int (no reduction)."""
    import numpy as np
    v = 0
    for i, c in enumerate(np.asarray(limbs).astype(object)):
        v += int(c) << (16 * i)
    return v % P_INT


def from_int(v: int):
    """python int -> [16] canonical int32 limbs."""
    import numpy as np
    v %= P_INT
    return np.array([(v >> (16 * i)) & MASK16 for i in range(L16)],
                    dtype=np.int32)


def from_radix13(a: jax.Array) -> jax.Array:
    """[..., 20] radix-2^13 limbs -> [..., 16] radix-2^16 limbs (in-jax,
    exact for weakly-normalized inputs).  Bit-serial repack through a 260-bit
    accumulator is avoided: each 13-bit limb lands in at most two 16-bit
    limbs; accumulate then relax once (values stay < 2^31)."""
    out = jnp.zeros(a.shape[:-1] + (L16 + 1,), jnp.int32)
    for i in range(F.L):
        bit = 13 * i
        j, off = divmod(bit, 16)
        lo = (a[..., i] << off) & MASK16
        hi = a[..., i] >> (16 - off) if off else jnp.zeros_like(a[..., i])
        out = out.at[..., j].add(lo)
        out = out.at[..., j + 1].add(hi)
    # limb 16 collects bits >= 256 (weak-normal radix-13 can reach 2^256+eps)
    out, top = out[..., :L16], out[..., L16]
    out = out.at[..., 0].add(top * FOLD16)
    # one relax pass: limb sums < 2*2^16 + overflowed shifts, carries tiny
    for _ in range(2):
        carry = out >> 16
        out = (out & MASK16) + jnp.concatenate(
            [carry[..., -1:] * FOLD16, carry[..., :-1]], axis=-1)
    return out


# --- kernel arithmetic (shared by interpret + Mosaic) -----------------------
def _fold_roll16(c):
    rolled = pltpu.roll(c, shift=1, axis=0)
    row0 = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 0) == 0
    return jnp.where(row0, rolled * FOLD16, rolled)


def _carry_relax16(t, passes: int):
    for _ in range(passes):
        t = (t & MASK16) + _fold_roll16(t >> W16)
    return t


def _conv16(a, b):
    """[16, T] x [16, T] -> [16, T] weakly-normalized product.

    Split-operand convolution: b = b_lo + 2^8 b_hi (b_lo < 2^8,
    b_hi <= 2^16/2^8 + 1 for weak-normal b), accumulate
    A_k = sum a_i b_lo_j, B_k = sum a_i b_hi_j over i + j = k.
    Bounds: a_i <= 2^16+38, so A_k <= 16*(2^16+38)*255 ~ 2.68e8 and
    B_k <= 16*(2^16+38)*257 ~ 2.70e8 — both < 2^31.  Recombine
    c_k = A_k + 2^8 B_k via the 16-bit decomposition of the shift
    (2^8 B_k = ((B_k & 0xFF) << 8) at k plus (B_k >> 8) at k+1), keeping
    every intermediate < 2^31: t_k <= 2.68e8 + 2^24 + 2.7e8/2^8 < 2^29."""
    b_lo = b & 0xFF
    b_hi = b >> 8
    rest = tuple([(0, 0)] * (b.ndim - 1))
    pa = []
    pb = []
    for i in range(L16):
        row = a[i, :][None]
        pa.append(jnp.pad(row * b_lo, ((i, L16 - 1 - i),) + rest))
        pb.append(jnp.pad(row * b_hi, ((i, L16 - 1 - i),) + rest))
    A = sum(pa)                                   # [31, T]
    B = sum(pb)                                   # [31, T]
    # c = A + 2^8 B, decomposed to stay in int32: 32 coefficients
    t = (jnp.pad(A, ((0, 1),) + rest)
         + jnp.pad((B & 0xFF) << 8, ((0, 1),) + rest)
         + jnp.pad(B >> 8, ((1, 0),) + rest))     # [32, T]
    # fold coefficients 16..31 (weights 2^(256+16j) = 38 * 2^(16j)):
    # 38*top needs its own lo/hi split (38 * 2^29 would overflow)
    main, top = t[:L16], t[L16:]
    acc = (main
           + FOLD16 * (top & MASK16)
           + jnp.pad(FOLD16 * (top >> W16), ((1, 0),) + rest)[:L16])
    # top[15] >> 16 folded into row 16 -> wraps again to row 0 with *38
    wrap = FOLD16 * (t[31] >> W16) * FOLD16
    acc = acc.at[0].add(wrap) if acc.ndim == 1 else (
        acc + jnp.pad(wrap[None], ((0, L16 - 1),) + rest))
    # acc_k <= 2^29 + 38*2^16 + 38*2^13 + eps < 2^30; three relax passes
    # reach weak normal (pass1 carry <= 2^14, pass2 <= 38, pass3 <= 1)
    return _carry_relax16(acc, 3)


def _mul16_kernel(a_ref, b_ref, o_ref):
    o_ref[:, :] = _conv16(a_ref[:, :], b_ref[:, :])


def _sq16_kernel(a_ref, o_ref):
    a = a_ref[:, :]
    o_ref[:, :] = _conv16(a, a)


def _run16(kernel, arity, *args):
    """args: [n, 16] -> [n, 16] via tiled [16, T] Pallas kernel."""
    n = args[0].shape[0]
    nt = max(1, -(-n // LANES))
    npad = nt * LANES
    ins = []
    for a in args:
        if a.shape[0] != npad:
            a = jnp.concatenate(
                [a, jnp.zeros((npad - a.shape[0], L16), a.dtype)], axis=0)
        ins.append(a.T)
    out = pl.pallas_call(
        kernel,
        out_shape=sds((L16, npad), jnp.int32, *ins),
        grid=(nt,),
        in_specs=[pl.BlockSpec((L16, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] * arity,
        out_specs=pl.BlockSpec((L16, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(*ins)
    return out.T[:n]


@jax.jit
def mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """[n, 16] x [n, 16] -> [n, 16] weakly-normalized field product."""
    return _run16(_mul16_kernel, 2, a, b)


@jax.jit
def sq(a: jax.Array) -> jax.Array:
    return _run16(_sq16_kernel, 1, a)


@functools.partial(jax.jit, static_argnames=("reps",))
def mul_chain(a: jax.Array, b: jax.Array, reps: int) -> jax.Array:
    """reps dependent muls in ONE kernel dispatch — the A/B shape used by
    benchmarks/bench_radix16.py (matches bench_addrate's chained-op style so
    per-dispatch overhead cancels out of the comparison)."""
    def kern(a_ref, b_ref, o_ref):
        def body(_, x):
            return _conv16(x, b_ref[:, :])
        o_ref[:, :] = jax.lax.fori_loop(0, reps, body, a_ref[:, :])
    return _run16(kern, 2, a, b)
