"""Batched scalar arithmetic mod l (the curve group order), TPU-native.

l = 2^252 + delta,  delta = 27742317777372353535851937790883648493 (~2^124.4).

Why this exists: round 1 kept all mod-l algebra on host (utils/scalars.py) —
correct, but every Fiat-Shamir challenge then forces a device->host sync, and
the TPU prover pays ~7 tunnel round trips per proof (NOTES.md item 4 /
VERDICT round-1 item 1).  With scalar algebra ON DEVICE the whole
prove/verify becomes a single jitted program: transcript hashing
(ops/sha256.py), challenge reduction, vector polynomials, IPA folds and the
final MSMs all fuse into one dispatch.

Representation (TPU-first, not a port): int32 limbs of 12 bits, 22 limbs
(capacity 264 bits), little-endian: value = sum(limb[i] * 2^(12*i)).  Radix
2^12 is chosen because 252 = 12*21 exactly — the 2^252 == -delta (mod l)
fold boundary lands on a limb edge, so reduction is limb-aligned shifts and
small constant convolutions, never a bit-splice.  (The field layer uses radix
2^13 because ITS fold constant 2^260 mod p = 608 is tiny; delta is 125 bits,
so the scalar fold is a conv by an 11-limb constant instead.)

Bound discipline mirrors ops/field.py: stored limbs are *weakly normalized*
(each <= WEAK = 2^13-1; value possibly >= l); every partial product/sum is
proven < 2^31 by the static bound chain asserted at import time.  Negative
intermediates never exist: subtraction-shaped steps add a precomputed
multiple of l whose redundant digit vector dominates the subtrahend
limb-wise (_dominating_multiple).  `canonical` fully reduces to [0, l).

The reference has no scalar-field layer at all — it does exponent arithmetic
mod p (bulletproof_range_proof.cu:1348-1511), which is the root cause of its
broken verification (SURVEY.md §8).  Host twin: utils/scalars.py (python
ints); differential tests: tests/test_scalar_field.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.oracle import ELL

SW = 12                      # bits per limb
SMASK = (1 << SW) - 1        # 0xFFF
SL = 22                      # limbs per scalar (264-bit capacity)
DELTA = ELL - (1 << 252)     # l = 2^252 + DELTA
DTYPE = jnp.int32

WEAK = (1 << 13) - 1         # weak per-limb invariant (13 bits)

_DELTA_NL = -(-DELTA.bit_length() // SW)            # 11 limbs
assert _DELTA_NL == 11


def _int_to_limbs(x: int, nl: int) -> np.ndarray:
    assert 0 <= x < (1 << (SW * nl)), (x.bit_length(), nl)
    return np.array([(x >> (SW * i)) & SMASK for i in range(nl)],
                    dtype=np.int32)


_DELTA_LIMBS = _int_to_limbs(DELTA, _DELTA_NL)


def _dominating_multiple(dom_max: int, need: int, nk: int) -> np.ndarray:
    """Digit vector (length nk, radix 2^12, digits in [0, 2^15)) of a
    multiple of l whose digits 0..need-1 all exceed dom_max.  Adding it
    makes any `K - t` (t having limbs <= dom_max confined to 0..need-1)
    limb-wise non-negative — the all-positive stand-in for subtraction.
    Pure host precomputation; every property asserted."""
    B = sum((dom_max + 1) << (SW * i) for i in range(need))
    k = -(-max(B, ELL) // ELL) * ELL
    assert k < (1 << (SW * nk)), "nk too small for the dominating multiple"
    digits = [(k >> (SW * i)) & SMASK for i in range(nk)]
    digits = np.array(digits, dtype=np.int64)
    for i in range(need):
        while digits[i] <= dom_max:
            digits[i] += 1 << SW
            digits[i + 1] -= 1
    for i in range(nk - 1):                      # resolve borrow cascades
        while digits[i] < 0:
            digits[i] += 1 << SW
            digits[i + 1] -= 1
    assert digits[nk - 1] >= 0
    assert all(0 <= d < (1 << 15) for d in digits)
    assert all(digits[i] > dom_max for i in range(need))
    assert sum(int(d) << (SW * i) for i, d in enumerate(digits)) == k
    assert k % ELL == 0
    return digits.astype(np.int32)


# --- host <-> device ---------------------------------------------------------
def from_int(x: int, shape=()) -> jax.Array:
    arr = jnp.asarray(_int_to_limbs(x % ELL, SL))
    return jnp.broadcast_to(arr, tuple(shape) + (SL,))


def from_ints(xs) -> jax.Array:
    out = np.zeros((len(xs), SL), dtype=np.int32)
    for j, x in enumerate(xs):
        out[j] = _int_to_limbs(x % ELL, SL)
    return jnp.asarray(out)


def to_int(a) -> int:
    """[SL] limb array -> python int (NOT reduced mod l)."""
    limbs = np.asarray(a)
    assert limbs.shape[-1] == SL
    return sum(int(v) << (SW * i) for i, v in enumerate(limbs))


def to_ints(a):
    arr = np.asarray(a).reshape(-1, SL)
    return [sum(int(v) << (SW * i) for i, v in enumerate(row)) for row in arr]


def zeros(shape=()) -> jax.Array:
    return jnp.zeros(tuple(shape) + (SL,), dtype=DTYPE)


def ones(shape=()) -> jax.Array:
    return jnp.zeros(tuple(shape) + (SL,), dtype=DTYPE).at[..., 0].set(1)


# --- carry relaxation --------------------------------------------------------
def _relax_open(t: jax.Array, passes: int) -> jax.Array:
    """Parallel carry relaxation over the last axis WITHOUT wraparound.
    Value-preserving iff no carry leaves the top limb — guaranteed by the
    callers' value bounds (each asserted at import): a limb can only exceed
    2^12 while the value's magnitude still reaches that limb's weight."""
    for _ in range(passes):
        hi = t >> SW
        t = (t & SMASK) + jnp.concatenate(
            [jnp.zeros_like(hi[..., :1]), hi[..., :-1]], axis=-1)
    return t


def _pad_last(t: jax.Array, extra: int) -> jax.Array:
    return jnp.pad(t, [(0, 0)] * (t.ndim - 1) + [(0, extra)])


def _conv_const(a: jax.Array, b_limbs: np.ndarray) -> jax.Array:
    """Convolution of [..., na] limbs with a constant limb vector ->
    [..., na + nb - 1] int32 coefficients (bounds asserted by callers)."""
    nb = len(b_limbs)
    na = a.shape[-1]
    out = None
    for i in range(nb):
        c = int(b_limbs[i])
        if c == 0:
            continue
        p = a * jnp.int32(c)
        p = jnp.pad(p, [(0, 0)] * (a.ndim - 1) + [(i, nb - 1 - i)])
        out = p if out is None else out + p
    if out is None:
        out = jnp.zeros(a.shape[:-1] + (na + nb - 1,), dtype=DTYPE)
    return out


def _conv_var(a: jax.Array, b: jax.Array) -> jax.Array:
    """Convolution of two variable [..., SL] limb arrays -> [..., 2*SL-1].
    Coefficient bound: SL * WEAK^2 = 22 * 8191^2 = 1.48e9 < 2^31."""
    nd = max(a.ndim, b.ndim)
    a = a.reshape((1,) * (nd - a.ndim) + a.shape)
    b = b.reshape((1,) * (nd - b.ndim) + b.shape)
    parts = []
    for i in range(SL):
        prod = a[..., i : i + 1] * b
        parts.append(jnp.pad(prod, [(0, 0)] * (prod.ndim - 1)
                             + [(i, SL - 1 - i)]))
    return sum(parts)


assert SL * WEAK * WEAK < (1 << 31)


# --- the fold: x = lo + 2^252 * hi  ==>  x == lo - delta*hi (mod l) ----------
# Evaluated all-positive as lo + (K - delta*hi), K from _dominating_multiple.
class _FoldPlan:
    """Static plan for folding an nl-limb weak value (nl > 21) at the 2^252
    boundary.  All bounds proven here, once, on host ints."""
    __slots__ = ("nl", "k_digits", "out")

    def __init__(self, nl: int):
        assert nl > 21
        nh = nl - 21
        nt = _DELTA_NL + nh - 1 + 1      # conv limbs + 1 relax headroom limb
        # conv coefficient bound
        assert min(_DELTA_NL, nh) * WEAK * WEAK < (1 << 31)
        # t after 3 relax passes has limbs <= 4096 < 2^13
        nk = max(nt + 1, SL + 1)
        digits = _dominating_multiple(1 << 13, nt, nk)
        while len(digits) > nt and digits[-1] == 0:  # trim so folds SHRINK
            digits = digits[:-1]
        self.k_digits = digits
        kval = sum(int(d) << (SW * i) for i, d in enumerate(digits))
        lo_max = sum(WEAK << (SW * i) for i in range(21))
        # result y = lo + (K - t) < lo_max + kval must fit `out` limbs so no
        # relax carry can escape the top
        out = max(21, len(digits))
        while lo_max + kval >= (1 << (SW * out)):
            out += 1
        self.out = out
        self.nl = nl


@functools.lru_cache(maxsize=None)
def _fold_plan(nl: int) -> _FoldPlan:
    return _FoldPlan(nl)


def _fold_once(x: jax.Array) -> jax.Array:
    """One 2^252-boundary fold; [..., nl] weak -> [..., plan.out] weak,
    value preserved mod l."""
    plan = _fold_plan(x.shape[-1])
    lo, hi = x[..., :21], x[..., 21:]
    t = _conv_const(hi, _DELTA_LIMBS)
    t = _relax_open(_pad_last(t, 1), 3)              # limbs <= 4096
    k = jnp.asarray(plan.k_digits)
    y = k - _pad_last(t, len(plan.k_digits) - t.shape[-1])
    y = _pad_last(y, plan.out - y.shape[-1])
    y = y.at[..., :21].add(lo)                       # limbs < 2^16
    return _relax_open(y, 3)


def reduce_limbs(x: jax.Array) -> jax.Array:
    """Fold an arbitrary-width weak limb array down to SL limbs (mod l)."""
    while x.shape[-1] > SL:
        nxt = _fold_once(x)
        assert nxt.shape[-1] < x.shape[-1], "fold failed to shrink"
        x = nxt
    if x.shape[-1] < SL:
        x = _pad_last(x, SL - x.shape[-1])
    return x


# sanity: the fold chain terminates from any width we produce
for _nl in (23, 24, 25, 28, 36, 45, 47):
    _w = _nl
    for _ in range(8):
        if _w <= SL:
            break
        _w = _fold_plan(_w).out
    assert _w <= SL, (_nl, _w)


# --- ring ops ----------------------------------------------------------------
@jax.jit
def add(a: jax.Array, b: jax.Array) -> jax.Array:
    """Sum limbs (<= 2*WEAK < 2^14), give carries two pad limbs of room,
    relax, fold back to SL."""
    t = _relax_open(_pad_last(a + b, 2), 2)
    return reduce_limbs(t)


_KSUB = _dominating_multiple(WEAK, SL, SL + 2)


@jax.jit
def sub(a: jax.Array, b: jax.Array) -> jax.Array:
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, batch + (SL,))
    b = jnp.broadcast_to(b, batch + (SL,))
    k = jnp.asarray(_KSUB)
    y = k - _pad_last(b, len(_KSUB) - SL)
    y = y.at[..., :SL].add(a)
    return reduce_limbs(_relax_open(_pad_last(y, 1), 3))


@jax.jit
def neg(b: jax.Array) -> jax.Array:
    return sub(zeros(b.shape[:-1]), b)


@jax.jit
def mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Schoolbook conv + limb-aligned folds; all int32-exact."""
    acc = _conv_var(a, b)                            # [..., 43]
    acc = _relax_open(_pad_last(acc, 2), 3)          # [..., 45] weak
    return reduce_limbs(acc)


@jax.jit
def sq(a: jax.Array) -> jax.Array:
    return mul(a, a)


@functools.partial(jax.jit, static_argnames=("axis",))
def sum_mod(x: jax.Array, axis: int = 0) -> jax.Array:
    """Sum of a batch of scalars mod l (exact for batch <= 2^17:
    batch * WEAK < 2^31 pre-relax)."""
    n = x.shape[axis]
    assert n * WEAK < (1 << 31)
    s = jnp.sum(x, axis=axis)
    extra = -(-(n.bit_length() + 2) // SW) + 2
    s = _relax_open(_pad_last(s, extra), 3)
    return reduce_limbs(s)


@jax.jit
def inner(a: jax.Array, b: jax.Array) -> jax.Array:
    """<a, b> mod l over the leading axis: batched mul + sum_mod."""
    return sum_mod(mul(a, b), axis=0)


# --- canonicalization & comparisons ------------------------------------------
_ELL_COMP = _int_to_limbs((1 << (SW * SL)) - ELL, SL)   # 2^264 - l


def _carry_seq(t: jax.Array):
    """Sequential full carry pass; returns (limbs, carry_out_of_top)."""
    limbs = [t[..., i] for i in range(SL)]
    out = []
    c = jnp.zeros_like(limbs[0])
    for i in range(SL):
        v = limbs[i] + c
        out.append(v & SMASK)
        c = v >> SW
    return jnp.stack(out, axis=-1), c


@jax.jit
def canonical(a: jax.Array) -> jax.Array:
    """Fully reduce a weak scalar to [0, l), still in limb form."""
    # fold the 2^252+ part: value < 2^266 -> < ~2^253
    x = reduce_limbs(_fold_once(_pad_last(a, 1)))
    # second fold pass: the first can leave value in [l, 2^253+eps)
    x = reduce_limbs(_fold_once(_pad_last(x, 1)))
    x, _ = _carry_seq(x)
    comp = jnp.asarray(_ELL_COMP)
    for _ in range(2):
        u, c = _carry_seq(x + comp)                  # carry==1 <=> x >= l
        x = jnp.where((c > 0)[..., None], u, x)
    return x


@jax.jit
def eq(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.all(canonical(a) == canonical(b), axis=-1)


@jax.jit
def is_zero(a: jax.Array) -> jax.Array:
    return jnp.all(canonical(a) == 0, axis=-1)


# --- serialization (32-byte little-endian, canonical) ------------------------
def _pack_plan():
    plan = []
    for j in range(32):
        i0, off = (8 * j) // SW, (8 * j) % SW
        plan.append((i0, off, SW - off < 8 and i0 + 1 < SL))
    return plan


_PACK = _pack_plan()


@jax.jit
def to_bytes(a: jax.Array) -> jax.Array:
    """Canonical 32-byte LE serialization (the transcript's scalar format,
    matching utils/scalars.sc_to_bytes)."""
    a = canonical(a)
    outs = []
    for j in range(32):
        i0, off, second = _PACK[j]
        v = a[..., i0] >> off
        if second:
            v = v | (a[..., i0 + 1] << (SW - off))
        outs.append(v & 0xFF)
    return jnp.stack(outs, axis=-1).astype(jnp.uint8)


@jax.jit
def from_bytes(b: jax.Array) -> jax.Array:
    """32-byte LE (any 256-bit value) -> weak limbs, NOT reduced mod l.
    Bits 252..255 land in limb 21, so any 2^256 value fits SL limbs."""
    b = b.astype(DTYPE)
    outs = []
    for i in range(SL):
        j0, off = (SW * i) // 8, (SW * i) % 8
        v = b[..., j0] >> off
        if j0 + 1 < 32:
            v = v | (b[..., j0 + 1] << (8 - off))
        outs.append(v & SMASK)
    return jnp.stack(outs, axis=-1)


# --- inversion (Fermat) ------------------------------------------------------
_EXP_NB = (ELL - 2).bit_length()                     # 253
_EXP_BITS = np.array([(ELL - 2) >> i & 1 for i in range(_EXP_NB)][::-1],
                     dtype=np.int32)                 # MSB-first


@jax.jit
def invert(x: jax.Array) -> jax.Array:
    """x^(l-2) mod l via MSB-first square-and-multiply (l is prime).

    A lax.fori_loop over the 253 constant exponent bits keeps the jit graph
    ~2 ops instead of ~500 inlined convolutions (compile-time discipline:
    NOTES.md — compiles through the tunnel are the scarce resource)."""
    bits = jnp.asarray(_EXP_BITS)
    acc = ones(x.shape[:-1])

    def body(i, acc):
        acc = sq(acc)
        return jnp.where(bits[i] > 0, mul(acc, x), acc)

    return jax.lax.fori_loop(0, _EXP_NB, body, acc)


@functools.partial(jax.jit, static_argnames=("axis",))
def batch_invert(a: jax.Array, axis: int = 0) -> jax.Array:
    """Montgomery batch inversion mod l: one Fermat chain for any batch.
    (The reference's racy prefix-product kernel, cuda_field_ops.cu:222-254,
    becomes a race-free associative_scan — same fix as field.batch_invert.)"""
    if axis != 0:
        a = jnp.moveaxis(a, axis, 0)
    prefix = jax.lax.associative_scan(mul, a, axis=0)
    total_inv = invert(prefix[-1])
    suffix = jax.lax.associative_scan(mul, a[::-1], axis=0)[::-1]
    n = a.shape[0]
    pre = jnp.concatenate([ones(a.shape[1:-1])[None], prefix[: n - 1]], axis=0)
    suf = jnp.concatenate([suffix[1:], ones(a.shape[1:-1])[None]], axis=0)
    out = mul(mul(pre, suf), total_inv[None])
    if axis != 0:
        out = jnp.moveaxis(out, 0, axis)
    return out


@functools.partial(jax.jit, static_argnames=("n",))
def powers(base: jax.Array, n: int) -> jax.Array:
    """[1, base, ..., base^(n-1)] as [n, SL] via log-doubling (n static).

    Reference analogue: powers_of (bulletproof_range_proof.cu:299-312)."""
    out = ones((1,))
    k = 1
    cur = base                                       # base^(2^j) after j steps
    while k < n:
        take = min(k, n - k)
        out = jnp.concatenate([out, mul(out[:take], cur[None])], axis=0)
        cur = sq(cur)
        k += take
    return out


# --- bridge to the field-limb MSM format -------------------------------------
@jax.jit
def to_field_limbs(a: jax.Array) -> jax.Array:
    """Scalar (22x12-bit limbs mod l) -> MSM scalar format (20x13-bit limbs,
    ops/field.py convention).  Exact: canonical value < l < 2^253 fits both;
    routed through the canonical byte form so the bit repack is shared."""
    from . import field as F
    return F.from_bytes(to_bytes(a))
