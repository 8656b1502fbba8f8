"""Exact host-side oracle: ed25519 field/curve/scalar math over Python ints.

This plays the role the reference's *host* C++ layer plays (curve25519_ops.cu
host functions) but with correct math: full Fermat inversion, real square
roots, real curve membership.  It is the ground truth that every JAX/Pallas
kernel is tested bit-exactly against, and it derives the deterministic
generator sets (the reference derives generators that are not on the curve,
complete_bulletproof_test.cu:33-63 -- we use try-and-increment hash-to-curve
with cofactor clearing instead).

Scalar arithmetic here is mod the prime group order l (the reference wrongly
does all scalar math mod p; correct exponent algebra requires mod-l).
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass

P = (1 << 255) - 19
# group order of the prime-order subgroup
ELL = (1 << 252) + 27742317777372353535851937790883648493
D = (-121665 * pow(121666, P - 2, P)) % P
D2 = (2 * D) % P
SQRT_M1 = pow(2, (P - 1) // 4, P)  # sqrt(-1) mod p

# standard ed25519 base point (y = 4/5, x even... sign bit 0)
BASE_Y = (4 * pow(5, P - 2, P)) % P


def finv(x: int) -> int:
    return pow(x, P - 2, P)


def fsqrt(u: int, v: int):
    """Return r with r^2 * v == u (mod p), or None. (ed25519 decompression.)"""
    v3 = v * v % P * v % P
    v7 = v3 * v3 % P * v % P
    r = u * v3 % P * pow(u * v7 % P, (P - 5) // 8, P) % P
    check = v * r % P * r % P
    if check == u % P:
        return r
    if check == (-u) % P:
        return r * SQRT_M1 % P
    return None


@dataclass(frozen=True)
class Point:
    """Extended twisted-Edwards coordinates (X:Y:Z:T), T = XY/Z."""
    X: int
    Y: int
    Z: int
    T: int

    def __add__(self, other: "Point") -> "Point":
        # unified add-2008-hwcd-3 for a=-1 (same formula family the JAX curve
        # layer uses; reference analogue: ge25519_add, curve25519_ops.cu:326-378)
        A = (self.Y - self.X) * (other.Y - other.X) % P
        B = (self.Y + self.X) * (other.Y + other.X) % P
        C = self.T * D2 % P * other.T % P
        Dv = 2 * self.Z * other.Z % P
        E, F, G, H = (B - A) % P, (Dv - C) % P, (Dv + C) % P, (B + A) % P
        return Point(E * F % P, G * H % P, F * G % P, E * H % P)

    def double(self) -> "Point":
        return self + self

    def __neg__(self) -> "Point":
        return Point((-self.X) % P, self.Y, self.Z, (-self.T) % P)

    def __sub__(self, other: "Point") -> "Point":
        return self + (-other)

    def __mul__(self, s: int) -> "Point":
        acc, addend = IDENTITY, self
        s %= ELL
        while s:
            if s & 1:
                acc = acc + addend
            addend = addend.double()
            s >>= 1
        return acc

    __rmul__ = __mul__

    def affine(self):
        zi = finv(self.Z)
        return self.X * zi % P, self.Y * zi % P

    def compress(self) -> bytes:
        x, y = self.affine()
        return (y | ((x & 1) << 255)).to_bytes(32, "little")

    def is_on_curve(self) -> bool:
        x, y = self.affine()
        return (-x * x + y * y - 1 - D * x * x % P * y % P * y) % P == 0 and \
            (self.T * self.Z - self.X * self.Y) % P == 0

    def __eq__(self, other) -> bool:  # projective equality
        return (self.X * other.Z - other.X * self.Z) % P == 0 and \
            (self.Y * other.Z - other.Y * self.Z) % P == 0


IDENTITY = Point(0, 1, 1, 0)


def decompress(b: bytes):
    """32-byte LE y-with-sign -> Point, or None if not on curve."""
    yint = int.from_bytes(b, "little")
    sign = yint >> 255
    y = yint & ((1 << 255) - 1)
    if y >= P:
        return None
    u = (y * y - 1) % P
    v = (D * y * y + 1) % P
    x = fsqrt(u, v)
    if x is None:
        return None
    if x == 0 and sign:
        return None
    if x & 1 != sign:
        x = P - x
    return Point(x, y, 1, x * y % P)


_bx = fsqrt((BASE_Y * BASE_Y - 1) % P, (D * BASE_Y * BASE_Y + 1) % P)
assert _bx is not None
if _bx & 1 == 1:
    _bx = P - _bx
BASE = Point(_bx, BASE_Y, 1, _bx * BASE_Y % P)
assert BASE.is_on_curve()
assert (ELL * BASE) == IDENTITY


def hash_to_point(label: bytes, index: int) -> Point:
    """Deterministic generator derivation: try-and-increment on
    SHA-256(label || index || counter) as a compressed-point candidate, then
    clear the cofactor.  (Replaces the reference's not-on-curve generator setup,
    complete_bulletproof_test.cu:33-63, with real curve points.)"""
    ctr = 0
    while True:
        h = hashlib.sha256(
            b"tpu-bulletproofs/gen" + label + index.to_bytes(8, "little")
            + ctr.to_bytes(8, "little")).digest()
        pt = decompress(h)
        if pt is not None:
            pt8 = 8 * pt
            if pt8 != IDENTITY:
                return pt8
        ctr += 1


def small_order_points():
    """The 8-torsion subgroup E[8] (the full curve group is Z_8 x Z_l).

    Used by tests to feed small-order / mixed-torsion points into proof
    decompression; the verifiers must reject the former and be invariant to
    the latter (cofactored verification).  The reference has no torsion
    handling at all (its ge25519_is_on_curve is a stub,
    curve25519_ops.cu:534-541)."""
    def mul_noreduce(p: Point, s: int) -> Point:
        # Point.__mul__ reduces mod l, which would make l*q the identity
        acc, addend = IDENTITY, p
        while s:
            if s & 1:
                acc = acc + addend
            addend = addend.double()
            s >>= 1
        return acc

    # find a generator of the torsion: l * (any point of full order 8l)
    ctr = 0
    while True:
        h = hashlib.sha256(b"torsion-probe" + ctr.to_bytes(8, "little")).digest()
        q = decompress(h)
        if q is not None:
            t = mul_noreduce(q, ELL)     # order divides 8
            if t != IDENTITY and t.double() != IDENTITY and \
                    t.double().double() != IDENTITY:
                break
        ctr += 1
    pts, acc = [], IDENTITY
    for _ in range(8):
        pts.append(acc)
        acc = acc + t
    assert acc == IDENTITY
    return pts


def sc_from_hash(data: bytes) -> int:
    """Challenge scalar: SHA-256 output, top bit cleared (matching the
    reference's generate_challenge, bulletproof_challenge.cu:6-21), reduced
    mod l."""
    v = int.from_bytes(data, "little")
    v &= (1 << 255) - 1
    return v % ELL


def sc_inv(x: int) -> int:
    return pow(x, ELL - 2, ELL)
