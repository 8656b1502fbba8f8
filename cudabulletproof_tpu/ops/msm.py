"""Multi-scalar multiplication: the hot kernel of Bulletproofs verification.

v0 strategy (correctness-first, already TPU-shaped): one branchless 253-step
ladder vectorized over all n points (the VPU analog of the reference's
point_scalar_mul_kernel, cuda_bulletproof_kernels.cu:26-42, where one CUDA
thread runs one ladder), followed by a log-depth tree reduction of batched
curve adds (replacing the stride-doubling point_accumulate_kernel,
cuda_bulletproof_kernels.cu:45-116, whose block-granular over-provisioning can
double-add).  A Pippenger bucket kernel supersedes this for large n in
ops/pippenger.py.

Sizes are padded to powers of two with identity points so each distinct
power-of-two compiles exactly once.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import curve as C
from . import field as F
from . import pippenger


@jax.jit
def msm(points: C.GE, scalars: jax.Array) -> C.GE:
    """sum_i scalars[i] * points[i].  points: GE [n]; scalars: int32 [n, 20]
    (radix-2^13 limbs, values < 2^253).  Returns a single GE.

    Reference parity: cuda_point_vector_multi_scalar_mul
    (cuda_bulletproof_kernels.cu:62-116) and the CPU fallback
    point_vector_multi_scalar_mul (bulletproof_vectors.cu:189-224)."""
    prods = C.scalarmult(points, scalars)
    return C.tree_reduce(prods)


def _pad_pow2(points: C.GE, scalars: jax.Array, pad_min: int = 1):
    n = scalars.shape[0]
    m = max(1, pad_min)
    while m < n:
        m *= 2
    if m == n:
        return points, scalars
    pad_p = C.identity((m - n,))
    pad_s = jnp.zeros((m - n, F.L), dtype=F.DTYPE)
    points = C.GE(*(jnp.concatenate([a, b], 0) for a, b in zip(points, pad_p)))
    return points, jnp.concatenate([scalars, pad_s], 0)


@functools.partial(jax.jit, static_argnames=("w",))
def msm_windowed(points: C.GE, scalars: jax.Array, w: int = 4) -> C.GE:
    """Straus windowed multiexp with per-point digit tables.

    Precompute T[d] = d*P_i (2^w - 1 batched adds), then process the scalar
    w bits at a time from the top: acc = 2^w*acc + sum_i T[digit_i, i].
    ~6x less point work than the bit ladder for w=4; the sweet spot for the
    protocol's n <= few-hundred MSMs (Pippenger wins for large n).
    """
    n = points.x.shape[0]
    nb = 1 << w
    tab = [C.identity((n,))]
    for _ in range(1, nb):
        tab.append(C.add(tab[-1], points))
    table = C.GE(*(jnp.stack([t[i] for t in tab]) for i in range(4)))
    digits = pippenger.extract_digits(scalars, w)        # [nw, n]
    nw = digits.shape[0]
    lane = jnp.arange(n)

    def body(j, acc):
        for _ in range(w):
            acc = C.double(acc)
        dig = digits[nw - 1 - j]                         # [n]
        sel = C.GE(*(c[dig, lane] for c in table))       # gather [n, L]
        return C.add(acc, C.tree_reduce(sel))

    # identity derived from varying data: required under shard_map
    init = C.identity_like(C.GE(*(c[0] for c in points)))
    return jax.lax.fori_loop(0, nw, body, init)


def msm_auto(points: C.GE, scalars: jax.Array) -> C.GE:
    """Size-routed MSM (crossovers measured on TPU v5e, bench_msm.py):

      n <= 1024 on TPU  -> fused-ladder Pallas MSM (2 dispatches; dispatch
                           count dominates at protocol sizes)
      n <  PIPPENGER_MIN -> Straus windowed
      else               -> bucket-method Pippenger, cost-model window
    """
    from .. import config
    from .pippenger import _use_scan_kernel
    n = scalars.shape[0]
    if (n <= 1024 and config.PALLAS_CURVE
            and jax.default_backend() == "tpu"):
        from . import pallas_curve as PC
        return PC.msm(points, scalars)
    if (config.MSM_ACCUM_KERNEL and _use_scan_kernel()
            and n >= config.MSM_PIPPENGER_MIN):
        # zero-shuffle accumulator kernel; above MSM_ACCUM_CHUNK, chunk and
        # add the chunk results — since the Horner window combine moved
        # in-kernel (round 4) every chunk returns a COMPLETE MSM of its
        # subset, so the chunk tax is one point-add per chunk (a 2^20-point
        # single program OOM-kills the remote compile helper; 2^18 compiles)
        ck = config.MSM_ACCUM_CHUNK
        if n <= ck:
            return pippenger.msm_accum(points, scalars)
        parts = []
        for off in range(0, n, ck):
            end = min(off + ck, n)
            p = C.GE(*(c[off:end] for c in points))
            s = scalars[off:end]
            if end - off < ck:
                p, s = _pad_pow2(p, s, pad_min=ck)
            parts.append(pippenger.msm_accum(p, s))
        stacked = C.GE(*(jnp.stack([pt[i] for pt in parts])
                         for i in range(4)))
        return C.tree_reduce(stacked)
    if n > config.MSM_CHUNK:
        # chunked: reuse ONE compiled bucket-MSM program per chunk and fold
        # the partial points (compute-bound, so chunking costs nothing; a
        # single 2^20-scale program is hostile to compile time/memory)
        ck = config.MSM_CHUNK
        w = config.msm_window_for(ck)
        parts = []
        for off in range(0, n, ck):
            end = min(off + ck, n)
            p = C.GE(*(c[off:end] for c in points))
            s = scalars[off:end]
            if end - off < ck:
                p, s = _pad_pow2(p, s, pad_min=ck)
            parts.append(pippenger.msm_pippenger(p, s, w=w))
        stacked = C.GE(*(jnp.stack([pt[i] for pt in parts]) for i in range(4)))
        return C.tree_reduce(stacked)
    if n >= config.MSM_PIPPENGER_MIN:
        return pippenger.msm_pippenger(points, scalars,
                                       w=config.msm_window_for(n))
    return msm_windowed(points, scalars, w=config.STRAUS_WINDOW)


def msm_ints(points: C.GE, scalars, pad_min: int = 64) -> C.GE:
    """Host-glue MSM: python-int scalars (mod l), padded to a power of two.

    pad_min=64 keeps every protocol-level MSM at one of a tiny set of padded
    shapes so the multiexp kernel compiles once per proof size (identity
    padding is free correctness-wise; scalars pad with 0)."""
    assert points.x.shape[0] == len(scalars), \
        (points.x.shape[0], len(scalars))
    sc = F.from_ints([s % F.P for s in scalars])  # scalars < l < p: exact
    p, s = _pad_pow2(points, sc, pad_min)
    return msm_auto(p, s)


@jax.jit
def msm_multi_compressed(points: C.GE, scalars: jax.Array) -> jax.Array:
    """B MSMs over the SAME bases in one dispatch, returning compressed bytes.

    points: GE [m]; scalars: [B, m, 20] -> uint8 [B, 32].

    This is the prover's round-trip killer: the protocol emits points in
    pairs/groups (A&S, T1&T2, each IPA round's L&R) interleaved with host
    Fiat-Shamir hashing; computing each group as one fused
    multi-MSM-plus-compression costs ONE device sync instead of ~3 (the
    tunnel's ~30 ms sync floor dominates small-proof proving)."""
    B, m = scalars.shape[0], scalars.shape[1]
    pb = C.GE(*(jnp.broadcast_to(c, (B, m, F.L)) for c in points))
    prods = C.scalarmult(pb, scalars)            # GE [B, m]
    acc = prods
    while m > 1:
        half = m // 2
        lo = C.GE(*(c[:, :half] for c in acc))
        hi = C.GE(*(c[:, half:] for c in acc))
        acc = C.add(lo, hi)
        m = half
    one = C.GE(*(c[:, 0] for c in acc))          # GE [B]
    return C.to_bytes_batch(one)


def msm_ints_multi(points: C.GE, scalar_lists, pad_min: int = 64):
    """Host glue: k python-int scalar lists over shared bases -> k compressed
    points (bytes), ONE device round trip."""
    m = points.x.shape[0]
    assert all(len(s) == m for s in scalar_lists)
    mm = max(1, pad_min)
    while mm < m:
        mm *= 2
    pts = points
    if mm != m:
        pad_p = C.identity((mm - m,))
        pts = C.GE(*(jnp.concatenate([a, b], 0) for a, b in zip(points, pad_p)))
    sc = jnp.stack([
        F.from_ints([s % F.P for s in sl] + [0] * (mm - m))
        for sl in scalar_lists])
    out = np.asarray(msm_multi_compressed(pts, sc))
    return [bytes(row.tolist()) for row in out]


def concat_ge(*parts: C.GE) -> C.GE:
    """Concatenate batched GE groups along the batch axis (builds MSM bases)."""
    comps = []
    for i in range(4):
        comps.append(jnp.concatenate(
            [p[i] if p[i].ndim == 2 else p[i][None] for p in parts], axis=0))
    return C.GE(*comps)

# (Round-1 carried fold_generators/scale_points helpers here for the IPA
# generator fold; the symbolic host-side fold in models/ipa.py made them
# dead code and they were removed — the reference's materialized fold,
# bulletproof_vectors.cu:641-663, has no device analog in this design.)
