"""Host-side scalar (mod l) vector bookkeeping for the protocol layer.

Design note (TPU-first): the Bulletproofs protocol's scalar-side math (powers
of challenges, vector polynomials l(x)/r(x), inner products over Z_l) touches
at most a few thousand 253-bit integers per proof — sequential, tiny, and
latency-bound. That is host work, not accelerator work; the FLOP-heavy parts
(every group operation: MSM, commitments, folds) run on TPU via ops/msm.py.
The reference instead does *all* scalar math mod p on the GPU path's CPU side
(bulletproof_range_proof.cu:1348-1511) — and mod p is the wrong modulus for
exponent arithmetic; correct Bulletproofs needs mod-l (the group order), which
is what makes the verifier's exact point-equality checks pass.
"""
from __future__ import annotations

import secrets

from .oracle import ELL

__all__ = [
    "ELL", "sc_add", "sc_sub", "sc_mul", "sc_inv", "sc_random",
    "vec_add", "vec_sub", "vec_scalar_mul", "vec_hadamard", "vec_inner",
    "vec_powers", "sc_to_bytes", "sc_from_bytes",
]


def sc_add(a: int, b: int) -> int:
    return (a + b) % ELL


def sc_sub(a: int, b: int) -> int:
    return (a - b) % ELL


def sc_mul(a: int, b: int) -> int:
    return (a * b) % ELL


def sc_inv(a: int) -> int:
    return pow(a, ELL - 2, ELL)


def sc_random() -> int:
    """Uniform scalar in [0, l). Reference analogue: generate_random_scalar
    (bulletproof_range_proof.cu:153-159) — but uniform mod l, not clamped."""
    return secrets.randbits(512) % ELL


def vec_add(a, b):
    return [(x + y) % ELL for x, y in zip(a, b, strict=True)]


def vec_sub(a, b):
    return [(x - y) % ELL for x, y in zip(a, b, strict=True)]


def vec_scalar_mul(a, s: int):
    return [(x * s) % ELL for x in a]


def vec_hadamard(a, b):
    return [(x * y) % ELL for x, y in zip(a, b, strict=True)]


def vec_inner(a, b) -> int:
    """<a, b> mod l. Reference analogue: field_vector_inner_product
    (bulletproof_vectors.cu:55-?); hot batched versions live on device."""
    return sum(x * y for x, y in zip(a, b, strict=True)) % ELL


def vec_powers(base: int, n: int):
    """[1, base, base^2, ...]. Reference: powers_of
    (bulletproof_range_proof.cu:299-312)."""
    out = [1] * n
    for i in range(1, n):
        out[i] = out[i - 1] * base % ELL
    return out


def sc_to_bytes(x: int) -> bytes:
    return (x % ELL).to_bytes(32, "little")


def sc_from_bytes(b: bytes) -> int:
    return int.from_bytes(b, "little") % ELL
