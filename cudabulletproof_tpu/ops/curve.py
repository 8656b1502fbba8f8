"""ge25519: batched twisted-Edwards (a=-1) point ops on extended coordinates.

TPU-native design: a batch of points is a pytree of four [..., 20] limb arrays
(X:Y:Z:T with T = XY/Z), so every group operation is a fixed straight-line
program of batched field ops — fully vmappable, no data-dependent branches
(the reference's ladder branches on scalar bits, curve25519_ops.cu:402-414; we
use lax.fori_loop + select, which is also constant-time by construction).

Parity map (reference -> here):
  ge25519 struct           (curve25519_ops.h:20-25)    -> GE namedtuple pytree
  ge25519_add              (curve25519_ops.cu:326-378) -> add (add-2008-hwcd-3)
  ge25519_sub/neg/double   (curve25519_ops.cu:381-446,560-563) -> sub/neg/double
  ge25519_scalarmult       (curve25519_ops.cu:397-415) -> scalarmult (branchless)
  ge25519_pack/unpack      (curve25519_ops.cu:449-531) -> to_bytes/from_bytes
  ge25519_normalize        (curve25519_ops.cu:574-605) -> normalize (real inverse)
  ge25519_is_identity      (curve25519_ops.cu:544-557) -> is_identity
  ge25519_is_on_curve      (stub at cu:534-541)        -> is_on_curve (real check)
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import field as F
from ..utils import oracle


class GE(NamedTuple):
    """Extended-coordinate point(s); each field is an int32 limb array [..., 20]."""
    x: jax.Array
    y: jax.Array
    z: jax.Array
    t: jax.Array

    @property
    def batch_shape(self):
        return self.x.shape[:-1]


# --- constants ---------------------------------------------------------------
_D2 = F.from_int(oracle.D2)          # 2d
_D = F.from_int(oracle.D)            # d
_SQRT_M1 = F.from_int(oracle.SQRT_M1)


def identity(shape=()) -> GE:
    return GE(F.zeros(shape), F.ones(shape), F.ones(shape), F.zeros(shape))


def identity_like(p: GE) -> GE:
    """Identity points with p's batch shape, *derived from p's data* — inside
    shard_map, loop carries must be 'varying' on the mesh axes, and constants
    built by identity() are not (scan carry type mismatch otherwise)."""
    z = p.x * 0
    return GE(z, z.at[..., 0].set(1), z.at[..., 0].set(1), z)


def base_point(shape=()) -> GE:
    return from_oracle([oracle.BASE]) if shape == () else _broadcast(
        from_oracle([oracle.BASE]), shape)


def _broadcast(p: GE, shape) -> GE:
    return GE(*(jnp.broadcast_to(c, tuple(shape) + (F.L,)) for c in p))


# --- host conversion ---------------------------------------------------------
def from_oracle(points) -> GE:
    """list[oracle.Point] -> GE with batch shape [n] (or scalar GE if n==1...)"""
    xs = F.from_ints([p.X for p in points])
    ys = F.from_ints([p.Y for p in points])
    zs = F.from_ints([p.Z for p in points])
    ts = F.from_ints([p.T for p in points])
    if len(points) == 1:
        return GE(xs[0], ys[0], zs[0], ts[0])
    return GE(xs, ys, zs, ts)


def to_oracle(p: GE):
    """GE [n] (or unbatched) -> list[oracle.Point]."""
    arrs = [np.asarray(c) for c in p]
    if arrs[0].ndim == 1:
        arrs = [a[None] for a in arrs]
    out = []
    for i in range(arrs[0].shape[0]):
        out.append(oracle.Point(*(
            sum(int(v) << (F.W * k) for k, v in enumerate(a[i])) % F.P
            for a in arrs)))
    return out


# --- group law ---------------------------------------------------------------
def _pallas_route(*batch_shapes) -> bool:
    """True when the batched Pallas point path should serve this op (TPU
    backend, batch large enough to fill lanes). Decided at trace time from
    static shapes."""
    from .. import config
    if not config.PALLAS_CURVE or jax.default_backend() != "tpu":
        return False
    batch = jnp.broadcast_shapes(*batch_shapes)
    n = 1
    for d in batch:
        n *= d
    return n >= config.PALLAS_CURVE_MIN


def _via_pallas(fn2, p: GE, q: GE | None) -> GE:
    """Broadcast+flatten batch dims, run a [n]-batched pallas point op,
    restore the batch shape."""
    from . import pallas_curve as PC
    shapes = [p.batch_shape] + ([q.batch_shape] if q is not None else [])
    batch = jnp.broadcast_shapes(*shapes)
    flat = lambda g: GE(*(jnp.broadcast_to(
        c, batch + (F.L,)).reshape(-1, F.L) for c in g))
    out = fn2(flat(p), flat(q)) if q is not None else fn2(flat(p))
    return GE(*(c.reshape(batch + (F.L,)) for c in out))


def add_xla(p: GE, q: GE) -> GE:
    """The pure-XLA unified add (used on CPU and for tiny batches)."""
    a = F.mul(F.sub(p.y, p.x), F.sub(q.y, q.x))
    b = F.mul(F.add(p.y, p.x), F.add(q.y, q.x))
    c = F.mul(F.mul(p.t, _D2), q.t)
    d = F.add(F.mul(p.z, q.z), F.mul(p.z, q.z))
    e = F.sub(b, a)
    f = F.sub(d, c)
    g = F.add(d, c)
    h = F.add(b, a)
    return GE(F.mul(e, f), F.mul(g, h), F.mul(f, g), F.mul(e, h))


@jax.jit
def add(p: GE, q: GE) -> GE:
    """Unified extended add (add-2008-hwcd-3 for a=-1); also valid for
    doubling and identity operands. Reference: ge25519_add
    (curve25519_ops.cu:326-378) which bakes the same k=2d constant.

    On TPU, batched adds dispatch to the fused Pallas kernel
    (ops/pallas_curve.py): the whole 9-mul straight-line program runs
    VMEM-resident, which measures ~200x faster than the XLA composition in
    chained contexts (XLA recompute-fuses long int32 chains)."""
    if _pallas_route(p.batch_shape, q.batch_shape):
        from . import pallas_curve as PC
        return _via_pallas(PC.add_raw, p, q)
    return add_xla(p, q)


@jax.jit
def double(p: GE) -> GE:
    """Reference: ge25519_double (curve25519_ops.cu:560-563) also reuses add."""
    if _pallas_route(p.batch_shape):
        from . import pallas_curve as PC
        return _via_pallas(PC.double_raw, p, None)
    return add_xla(p, p)


@jax.jit
def neg(p: GE) -> GE:
    return GE(F.neg(p.x), p.y, p.z, F.neg(p.t))


@jax.jit
def sub(p: GE, q: GE) -> GE:
    return add(p, neg(q))


def select(cond: jax.Array, a: GE, b: GE) -> GE:
    """Elementwise (over batch dims) branchless select: cond ? a : b."""
    c = cond[..., None].astype(bool)
    return GE(*(jnp.where(c, ca, cb) for ca, cb in zip(a, b)))


# --- scalar multiplication ---------------------------------------------------
SC_BITS = 253   # scalars are < l < 2^253


@jax.jit
def scalarmult(p: GE, s: jax.Array) -> GE:
    """Batched branchless double-and-add, MSB first over 253 bits.

    `s` is an int32 limb array [..., 20] (radix 2^13) holding scalars < 2^253.
    Reference: ge25519_scalarmult (curve25519_ops.cu:397-415), whose
    data-dependent branch becomes a select.  On TPU, batched ladders dispatch
    to the VMEM-resident fused Pallas ladder (ops/pallas_curve.py)."""
    batch = jnp.broadcast_shapes(p.batch_shape, s.shape[:-1])
    pb = _broadcast(p, batch) if p.batch_shape != batch else p
    sb = jnp.broadcast_to(s, batch + (F.L,))
    if _pallas_route(batch):
        from . import pallas_curve as PC
        flat = GE(*(c.reshape(-1, F.L) for c in pb))
        out = PC.scalarmult_raw(flat, sb.reshape(-1, F.L))
        return GE(*(c.reshape(batch + (F.L,)) for c in out))
    acc = identity_like(pb)

    def body(i, acc):
        k = SC_BITS - 1 - i
        bit = (jnp.take(sb, k // F.W, axis=-1) >> (k % F.W)) & 1
        acc = double(acc)
        return select(bit, add(acc, pb), acc)

    return jax.lax.fori_loop(0, SC_BITS, body, acc)


def scalarmult_base(s: jax.Array) -> GE:
    """Reference: ge25519_scalarmult_base (curve25519_ops.cu:426-437; its
    hardcoded 'basepoint' is bogus — we use the real ed25519 base point)."""
    return scalarmult(base_point(), s)


# --- normalization & serialization -------------------------------------------
@jax.jit
def normalize(p: GE) -> GE:
    """Z -> 1 via a real field inversion (the reference's device version is a
    stub that sets z_inv = 1, device_curve25519_ops.cuh:243-270)."""
    zi = F.invert(p.z)
    x = F.mul(p.x, zi)
    y = F.mul(p.y, zi)
    return GE(x, y, F.ones(p.batch_shape), F.mul(x, y))


@jax.jit
def normalize_batch(p: GE) -> GE:
    """Batched normalize with ONE inversion via Montgomery batch inversion."""
    assert len(p.batch_shape) == 1
    zi = F.batch_invert(p.z)
    x = F.mul(p.x, zi)
    y = F.mul(p.y, zi)
    return GE(x, y, F.ones(p.batch_shape), F.mul(x, y))


@jax.jit
def to_bytes(p: GE) -> jax.Array:
    """Compress: 32-byte LE y with sign(x) in bit 255.
    Reference: ge25519_pack (curve25519_ops.cu:449-467)."""
    zi = F.invert(p.z)
    x = F.mul(p.x, zi)
    y = F.mul(p.y, zi)
    sign = (F.canonical(x)[..., 0] & 1).astype(jnp.uint8)
    yb = F.to_bytes(y)
    return yb.at[..., 31].set(yb[..., 31] | (sign << 7))


def to_bytes_batch(p: GE) -> jax.Array:
    zi = F.batch_invert(p.z)
    x = F.mul(p.x, zi)
    y = F.mul(p.y, zi)
    sign = (F.canonical(x)[..., 0] & 1).astype(jnp.uint8)
    yb = F.to_bytes(y)
    return yb.at[..., 31].set(yb[..., 31] | (sign << 7))


@jax.jit
def from_bytes(b: jax.Array):
    """Decompress; returns (GE, valid_mask). Reference: ge25519_unpack
    (curve25519_ops.cu:470-531), but with a real square root + validity check.
    """
    sign = (b[..., 31] >> 7).astype(F.DTYPE)
    yb = b.at[..., 31].set(b[..., 31] & 0x7F)
    y = F.from_bytes(yb)
    y2 = F.sq(y)
    u = F.sub(y2, F.ones(y.shape[:-1]))          # y^2 - 1
    v = F.add(F.mul(_D, y2), F.ones(y.shape[:-1]))  # d*y^2 + 1
    v3 = F.mul(F.sq(v), v)
    v7 = F.mul(F.sq(v3), v)
    x = F.mul(F.mul(u, v3), F.pow2523(F.mul(u, v7)))
    vx2 = F.mul(v, F.sq(x))
    ok_direct = F.eq(vx2, u)
    ok_flip = F.eq(vx2, F.neg(u))
    x = select_fe(ok_direct, x, F.mul(x, _SQRT_M1))
    valid = jnp.logical_or(ok_direct, ok_flip)
    # canonical y < p required
    valid = jnp.logical_and(valid, jnp.all(F.canonical(y) == y, axis=-1))
    x_is_zero = F.is_zero(x)
    valid = jnp.logical_and(valid, ~(x_is_zero & (sign == 1)))
    x = select_fe(F.canonical(x)[..., 0] & 1 == sign, x, F.neg(x))
    return GE(x, y, F.ones(y.shape[:-1]), F.mul(x, y)), valid


def select_fe(cond, a, b):
    return jnp.where(cond[..., None], a, b)


# --- predicates --------------------------------------------------------------
@jax.jit
def is_identity(p: GE) -> jax.Array:
    """X == 0 and Y == Z. Reference: ge25519_is_identity (cu:544-557)."""
    return jnp.logical_and(F.is_zero(p.x), F.eq(p.y, p.z))


@jax.jit
def mul8(p: GE) -> GE:
    """[8]P via three doublings — cofactor clearing for ed25519's Z_8 torsion."""
    return double(double(double(p)))


@jax.jit
def is_small_order(p: GE) -> jax.Array:
    """True where P is in the 8-torsion subgroup E[8] (includes the identity).

    Verifiers reject small-order proof points outright and multiply their
    final multiexp checks by 8 ('cofactored verification'), so mixed-torsion
    components can never influence acceptance.  The reference performs no
    subgroup validation anywhere (ge25519_is_on_curve stub,
    curve25519_ops.cu:534-541)."""
    return is_identity(mul8(p))


@jax.jit
def is_on_curve(p: GE) -> jax.Array:
    """Projective check of -x^2 + y^2 = 1 + d x^2 y^2 plus the extended-coord
    invariant T*Z = X*Y.  (The reference's ge25519_is_on_curve is a stub that
    returns 1, curve25519_ops.cu:534-541.)"""
    x2, y2, z2 = F.sq(p.x), F.sq(p.y), F.sq(p.z)
    lhs = F.mul(F.sub(y2, x2), z2)
    rhs = F.add(F.sq(z2), F.mul(_D, F.mul(x2, y2)))
    eq1 = F.eq(lhs, rhs)
    eq2 = F.eq(F.mul(p.t, p.z), F.mul(p.x, p.y))
    return jnp.logical_and(eq1, eq2)


@jax.jit
def eq(p: GE, q: GE) -> jax.Array:
    """Exact projective equality: X1*Z2 == X2*Z1 and Y1*Z2 == Y2*Z1.
    (Replaces the reference's fuzzy byte-diff comparisons,
    bulletproof_vectors.cu:713-749.)"""
    ex = F.eq(F.mul(p.x, q.z), F.mul(q.x, p.z))
    ey = F.eq(F.mul(p.y, q.z), F.mul(q.y, p.z))
    return jnp.logical_and(ex, ey)


# --- reductions --------------------------------------------------------------
def tree_reduce(p: GE) -> GE:
    """Sum a batch [n] of points with a log-depth tree of batched adds.

    The reference's equivalent is the stride-doubling point_accumulate_kernel
    (cuda_bulletproof_kernels.cu:45-54) which has an over-provisioning hazard;
    a fold over halves is race-free and maps to full-width vector ops.
    """
    n = p.x.shape[0]
    m = 1
    while m < n:
        m *= 2
    if m != n:
        pad = identity((m - n,))
        p = GE(*(jnp.concatenate([c, pc], axis=0) for c, pc in zip(p, pad)))
    while m > 1:
        half = m // 2
        p = add(GE(*(c[:half] for c in p)), GE(*(c[half:] for c in p)))
        m = half
    return GE(*(c[0] for c in p))


def masked_tree_reduce(p: GE, mask: jax.Array) -> GE:
    """Sum of points where mask is true (mask: bool [n])."""
    p = select(mask, p, identity(p.batch_shape))
    return tree_reduce(p)
