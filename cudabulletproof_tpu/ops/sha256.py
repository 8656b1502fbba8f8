"""SHA-256 on device (pure JAX uint32 ops): the Fiat-Shamir hash.

Why: the protocol's only host dependency in round 1 was transcript hashing —
every challenge forced a device->host sync (~78 ms through the TPU tunnel,
7 of them per 16-bit proof).  Computing SHA-256 *inside* the jitted program
makes prove/verify single-dispatch: proof bytes in, result out, zero
host<->device round trips (VERDICT round-1, item 1).

Reference parity: the reference calls OpenSSL SHA256 on host
(bulletproof_challenge.cu:6-21); bit-exact agreement with hashlib.sha256 is
tested for all message lengths the transcript produces
(tests/test_sha256.py), so device challenges == host challenges byte-for-byte.

Design notes (TPU-first):
  * Message lengths are static at trace time (transcript messages are
    fixed-format: 32-byte state || label || 32-byte data), so padding is done
    by the tracer and the compiled kernel is straight-line code.
  * All words are uint32; additions wrap naturally, rotations are
    shift-or compositions.  The VPU has native 32-bit integer ops, so a
    batched hash is 64 rounds of full-width vector ops.
  * The message schedule W is kept as 16 rolling words (the standard
    in-place schedule), not 64, to minimize live registers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32

_K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5,
    0x3956c25b, 0x59f111f1, 0x923f82a4, 0xab1c5ed5,
    0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174,
    0xe49b69c1, 0xefbe4786, 0x0fc19dc6, 0x240ca1cc,
    0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7,
    0xc6e00bf3, 0xd5a79147, 0x06ca6351, 0x14292967,
    0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85,
    0xa2bfe8a1, 0xa81a664b, 0xc24b8b70, 0xc76c51a3,
    0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5,
    0x391c0cb3, 0x4ed8aa4a, 0x5b9cca4f, 0x682e6ff3,
    0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2], dtype=np.uint32)

_H0 = np.array([
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19], dtype=np.uint32)


def _rotr(x, r: int):
    return (x >> U32(r)) | (x << U32(32 - r))


def _compress(state, w):
    """One SHA-256 compression: state [..., 8] u32, w [..., 16] u32 (one
    512-bit block, big-endian words).  Returns new state.

    Structured as a fori_loop over 4 chunks of 16 rounds sharing ONE traced
    body: the transcript hashes ~50 blocks per fused proof, and a fully
    unrolled compression made the prover's StableHLO ~260k lines (~170k
    scalar u32 ops), wedging the TPU compile for >25 min.  The in-place
    16-word circular message schedule advances one chunk per iteration."""
    ws = tuple(w[..., i] for i in range(16))
    digest = tuple(state[..., i] for i in range(8))
    kall = jnp.asarray(_K)

    def chunk(i, carry):
        (a, b, c, d, e, f, g, h), nw = carry
        kblk = jax.lax.dynamic_slice_in_dim(kall, i * 16, 16)
        for j in range(16):
            S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = h + S1 + ch + kblk[j] + nw[j]
            S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            t2 = S0 + maj
            a, b, c, d, e, f, g, h = t1 + t2, a, b, c, t1 + d, e, f, g
        # next chunk's schedule (W[t] = W[t-16] + s0(W[t-15]) + W[t-7]
        # + s1(W[t-2]); in-place circular buffer, indices < j already new)
        nw = list(nw)
        for j in range(16):
            w15 = nw[(j + 1) % 16]
            w2 = nw[(j + 14) % 16]
            s0 = _rotr(w15, 7) ^ _rotr(w15, 18) ^ (w15 >> U32(3))
            s1 = _rotr(w2, 17) ^ _rotr(w2, 19) ^ (w2 >> U32(10))
            nw[j] = nw[j] + s0 + nw[(j + 9) % 16] + s1
        return (a, b, c, d, e, f, g, h), tuple(nw)

    digest, _ = jax.lax.fori_loop(0, 4, chunk, (digest, ws))
    out = jnp.stack(digest, axis=-1)
    return state + out


def _pad_plan(nbytes: int):
    """Static SHA-256 padding for an nbytes message: returns (num_blocks,
    tail_bytes) where tail_bytes is the 0x80 || zeros || 64-bit length
    suffix appended by the tracer."""
    total = nbytes + 1 + 8
    blocks = -(-total // 64)
    padlen = blocks * 64 - nbytes
    tail = bytearray(padlen)
    tail[0] = 0x80
    bitlen = nbytes * 8
    for i in range(8):
        tail[padlen - 1 - i] = (bitlen >> (8 * i)) & 0xFF
    return blocks, bytes(tail)


def _bytes_to_words(b):
    """uint8 [..., 4k] -> uint32 [..., k] big-endian."""
    b = b.astype(U32)
    return ((b[..., 0::4] << U32(24)) | (b[..., 1::4] << U32(16))
            | (b[..., 2::4] << U32(8)) | b[..., 3::4])


def _words_to_bytes(w):
    """uint32 [..., k] -> uint8 [..., 4k] big-endian."""
    parts = [((w >> U32(s)) & U32(0xFF)).astype(jnp.uint8)
             for s in (24, 16, 8, 0)]
    return jnp.stack(parts, axis=-1).reshape(w.shape[:-1] + (4 * w.shape[-1],))


def sha256(msg: jax.Array) -> jax.Array:
    """SHA-256 digest of a uint8 message [..., nbytes] -> uint8 [..., 32].

    nbytes is static (read from the traced shape); batch dims broadcast.
    Bit-exact with hashlib.sha256 (tested across lengths 0..200)."""
    nbytes = msg.shape[-1]
    blocks, tail = _pad_plan(nbytes)
    tail_arr = jnp.broadcast_to(
        jnp.asarray(np.frombuffer(tail, dtype=np.uint8)),
        msg.shape[:-1] + (len(tail),))
    full = jnp.concatenate([msg, tail_arr], axis=-1)
    words = _bytes_to_words(full)                 # [..., 16*blocks]
    state = jnp.broadcast_to(jnp.asarray(_H0), msg.shape[:-1] + (8,))
    if blocks == 1:
        return _words_to_bytes(_compress(state, words))
    # fori_loop over blocks: ONE compression body per sha256 call in the
    # HLO (a fused proof hashes ~50 blocks; unrolling them all dominated
    # the program size and TPU compile time)
    wblk = words.reshape(words.shape[:-1] + (blocks, 16))
    state = jax.lax.fori_loop(
        0, blocks,
        lambda i, s: _compress(s, jnp.take(wblk, i, axis=-2)), state)
    return _words_to_bytes(state)


def sha256_concat(*parts) -> jax.Array:
    """SHA-256 over the concatenation of uint8 arrays / static python bytes.

    Static bytes (labels, domain separators) are baked into the graph as
    constants; traced arrays are concatenated along the last axis."""
    batch = ()
    arrs = []
    for p in parts:
        if isinstance(p, (bytes, bytearray)):
            arrs.append(np.frombuffer(bytes(p), dtype=np.uint8))
        else:
            arrs.append(p)
            batch = jnp.broadcast_shapes(batch, p.shape[:-1])
    full = [jnp.broadcast_to(a, batch + a.shape[-1:]) for a in arrs]
    return sha256(jnp.concatenate(full, axis=-1))
