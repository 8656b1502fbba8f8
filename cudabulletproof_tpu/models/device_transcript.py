"""On-device Fiat-Shamir transcript: the zero-sync twin of transcript.py.

Round 1's protocol interleaved device MSMs with HOST hashing — every
challenge cost a device->host sync (~78 ms each through the TPU tunnel;
NOTES.md item 4).  This class runs the identical rolling-SHA-256 construction
*inside* the jitted program (ops/sha256.py for the hash, ops/scalar_field.py
for the mod-l challenge reduction), so an entire prove or verify compiles to
ONE dispatch: proof bytes in, result out (VERDICT round-1 item 1).

Bit-exactness contract: for the same appended bytes, DeviceTranscript.state
equals Transcript.state and every challenge equals Transcript.challenge
(tests/test_sha256.py::test_device_transcript_lockstep runs them in
lockstep).  Domain separators
are the reference's (bulletproof_challenge.cu:24-83): the device path proves
the SAME statements as the host path, byte for byte.

Batch dims broadcast: a [B]-batched transcript derives B independent
challenge streams in one program (batched verification).
"""
from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import scalar_field as SC
from ..ops.sha256 import sha256_concat


class DeviceTranscript:
    """Rolling transcript with uint8[..., 32] device state.

    Mirrors models.transcript.Transcript exactly:
      state0 = SHA-256(label)
      append: state' = SHA-256(state || label || data)
      challenge: c = SHA-256(domain || state) -> clear bit 255 -> mod l,
                 0 -> 1; then append("chal", domain || LE32(c)).
    """

    def __init__(self, label: bytes = b"tpu-bulletproofs", batch=()):
        init = np.frombuffer(hashlib.sha256(label).digest(), dtype=np.uint8)
        self.state = jnp.broadcast_to(jnp.asarray(init), tuple(batch) + (32,))

    def append(self, label: bytes, data: jax.Array) -> None:
        """data: uint8[..., k] (k static)."""
        self.state = sha256_concat(self.state, label, data)

    def append_point(self, label: bytes, compressed: jax.Array) -> None:
        assert compressed.shape[-1] == 32
        self.append(label, compressed)

    def append_scalar(self, label: bytes, s: jax.Array) -> None:
        """s: scalar limbs [..., SL]; appended as canonical 32-byte LE
        (matching Transcript.append_scalar's (s % l).to_bytes)."""
        self.append(label, SC.to_bytes(s))

    def challenge(self, domain: bytes) -> jax.Array:
        """Returns the challenge as canonical scalar limbs [..., SL]."""
        h = sha256_concat(domain, self.state)
        h = h.at[..., 31].set(h[..., 31] & 0x7F)     # clear bit 255
        c = SC.canonical(SC.from_bytes(h))
        c = jnp.where(SC.is_zero(c)[..., None], SC.ones(c.shape[:-1]), c)
        self.append(b"chal" + domain, SC.to_bytes(c))
        return c

    def append_points(self, label: bytes, pts: jax.Array) -> None:
        """Absorb a [k, 32] row of compressed points under ONE fixed label
        as a scanned body (one traced absorb kernel instead of k distinct
        ones; the rolling state binds the order, so per-index labels add
        nothing — round-5 transcript format change, kept in lockstep across
        the host (models/aggregate.py), device, and native
        (native/bulletproof.cpp) implementations)."""
        def absorb(state, b):
            t = DeviceTranscript.__new__(DeviceTranscript)
            t.state = state
            t.append_point(label, b)
            return t.state, None

        self.state, _ = jax.lax.scan(absorb, self.state, pts)

    def ipa_challenges(self, Ls, Rs, domain: bytes):
        """k IPA rounds — absorb (L_j, R_j), draw u_j — as ONE lax.scan body,
        plus all u_j^{-1} in ONE vectorized Fermat chain.

        Ls, Rs: uint8 [k, 32] compressed points (k static); returns
        (us, us_inv), each [k, SL].  Bit-exact with k sequential
        append_point/append_point/challenge calls — the scan body runs the
        identical op sequence on the identical rolling state.  Exists
        because a fused program's per-dispatch wall scales with its number
        of DISTINCT fusion kernels (benchmarks/bench_verify_anatomy.py):
        k traced copies of the round cost ~9 us/kernel every dispatch,
        a scanned body is emitted once."""
        k = Ls.shape[-2]
        if k == 0:
            z = jnp.zeros(self.state.shape[:-1] + (0, SC.SL), SC.DTYPE)
            return z, z

        def round_(state, LR):
            t = DeviceTranscript.__new__(DeviceTranscript)
            t.state = state
            t.append_point(b"ipL", LR[0])
            t.append_point(b"ipR", LR[1])
            u = t.challenge(domain)
            return t.state, u

        self.state, us = jax.lax.scan(round_, self.state, (Ls, Rs))
        return us, SC.invert(us)
