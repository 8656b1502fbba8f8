"""Fiat-Shamir transcript: SHA-256 with the reference's domain separators.

Challenge derivation mirrors the reference byte-for-byte in structure:
SHA-256(domain_sep || data) with the top bit of byte 31 cleared
(generate_challenge, bulletproof_challenge.cu:6-21), then reduced mod l (the
reference skips the mod-l reduction because it does scalar math mod p; the
cleared-top-bit value is kept as the hash preimage convention).

Domain separators match bulletproof_challenge.cu:24-83 and
bulletproof_vectors.cu:448-462:
  "BulletproofYChal", "BulletproofZChal", "BulletproofXChal",
  "InnerProductChal" (the per-round IPA challenge).
"""
from __future__ import annotations

import hashlib

from ..utils.scalars import ELL


def challenge(domain: bytes, data: bytes) -> int:
    """SHA-256(domain || data), clear top bit (parity with
    generate_challenge, bulletproof_challenge.cu:6-21), reduce mod l."""
    h = hashlib.sha256(domain + data).digest()
    v = int.from_bytes(h, "little") & ((1 << 255) - 1)
    v %= ELL
    if v == 0:   # negligible probability; challenges must be invertible
        v = 1
    return v


class Transcript:
    """Rolling transcript of compressed points / scalars.

    The reference keeps an explicit 32-byte rolling state only in the IPA
    (bulletproof_vectors.cu:448-462); the range-proof challenges hash the raw
    point coordinates (bulletproof_challenge.cu:24-77). We use one uniform
    rolling construction: state' = SHA-256(state || label || data)."""

    def __init__(self, label: bytes = b"tpu-bulletproofs"):
        self.state = hashlib.sha256(label).digest()

    def append(self, label: bytes, data: bytes) -> None:
        self.state = hashlib.sha256(self.state + label + data).digest()

    def append_point(self, label: bytes, compressed: bytes) -> None:
        assert len(compressed) == 32
        self.append(label, compressed)

    def append_scalar(self, label: bytes, s: int) -> None:
        self.append(label, (s % ELL).to_bytes(32, "little"))

    def challenge(self, domain: bytes) -> int:
        c = challenge(domain, self.state)
        self.append(b"chal", domain + c.to_bytes(32, "little"))
        return c
