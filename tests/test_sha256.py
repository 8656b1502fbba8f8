"""ops/sha256.py vs hashlib: bit-exact for every length the transcript uses
(and a dense sweep around block boundaries), plus batching and the
device-transcript lockstep test."""
import hashlib
import random

import jax.numpy as jnp
import numpy as np

from cudabulletproof_tpu.ops.sha256 import sha256, sha256_concat


def _dev(msg: bytes) -> bytes:
    arr = jnp.asarray(np.frombuffer(msg, dtype=np.uint8))
    return bytes(np.asarray(sha256(arr)).tolist())


def test_lengths_vs_hashlib():
    rng = random.Random(7)
    # 0..129 covers both sides of the 55/56 (one-block) and 119/120
    # (two-block) padding boundaries; add some long tails
    for ln in list(range(0, 130)) + [200, 255, 256, 1000]:
        msg = bytes(rng.randrange(256) for _ in range(ln))
        assert _dev(msg) == hashlib.sha256(msg).digest(), ln


def test_batched():
    rng = random.Random(8)
    msgs = [bytes(rng.randrange(256) for _ in range(100)) for _ in range(5)]
    arr = jnp.asarray(np.stack([np.frombuffer(m, dtype=np.uint8)
                                for m in msgs]))
    out = np.asarray(sha256(arr))
    for i, m in enumerate(msgs):
        assert bytes(out[i].tolist()) == hashlib.sha256(m).digest()


def test_concat_static_and_traced():
    a = b"domain-sep"
    b = bytes(range(32))
    c = bytes(range(64, 96))
    arr_b = jnp.asarray(np.frombuffer(b, dtype=np.uint8))
    arr_c = jnp.asarray(np.frombuffer(c, dtype=np.uint8))
    got = bytes(np.asarray(sha256_concat(a, arr_b, arr_c)).tolist())
    assert got == hashlib.sha256(a + b + c).digest()


def test_device_transcript_lockstep():
    """DeviceTranscript == host Transcript: same states, same challenges."""
    from cudabulletproof_tpu.models.device_transcript import DeviceTranscript
    from cudabulletproof_tpu.models.transcript import Transcript
    from cudabulletproof_tpu.ops import scalar_field as SC

    host = Transcript(b"lockstep-test")
    dev = DeviceTranscript(b"lockstep-test")
    rng = random.Random(9)
    for i in range(3):
        blob = bytes(rng.randrange(256) for _ in range(32))
        host.append_point(b"P", blob)
        dev.append_point(b"P", jnp.asarray(np.frombuffer(blob, np.uint8)))
        s = rng.randrange(SC.ELL)
        host.append_scalar(b"s", s)
        dev.append_scalar(b"s", SC.from_int(s))
        hc = host.challenge(b"SomeDomain%d" % i)
        dc = SC.to_ints(SC.canonical(dev.challenge(b"SomeDomain%d" % i)))[0]
        assert hc == dc, i
        assert bytes(np.asarray(dev.state).tolist()) == host.state, i


def test_scanned_transcript_methods_lockstep():
    """The round-5 scan methods (append_points / ipa_challenges) must be
    bit-exact with the equivalent sequential append/challenge calls — the
    scan body runs the identical op sequence on the identical rolling
    state (see DeviceTranscript docstrings)."""
    from cudabulletproof_tpu.models.device_transcript import DeviceTranscript
    from cudabulletproof_tpu.models.transcript import Transcript
    from cudabulletproof_tpu.ops import scalar_field as SC

    rng = random.Random(11)
    pts = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(5)]
    Ls = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(3)]
    Rs = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(3)]

    host = Transcript(b"scan-lockstep")
    for p in pts:
        host.append_point(b"V", p)
    host_us = []
    for lb, rb in zip(Ls, Rs):
        host.append_point(b"ipL", lb)
        host.append_point(b"ipR", rb)
        host_us.append(host.challenge(b"ipa-u"))

    dev = DeviceTranscript(b"scan-lockstep")
    dev.append_points(b"V", jnp.asarray(
        np.stack([np.frombuffer(p, np.uint8) for p in pts])))
    us, us_inv = dev.ipa_challenges(
        jnp.asarray(np.stack([np.frombuffer(b, np.uint8) for b in Ls])),
        jnp.asarray(np.stack([np.frombuffer(b, np.uint8) for b in Rs])),
        b"ipa-u")
    assert bytes(np.asarray(dev.state).tolist()) == host.state
    for j, hu in enumerate(host_us):
        du = SC.to_ints(SC.canonical(us[j]))[0]
        assert du == hu, j
        dinv = SC.to_ints(SC.canonical(us_inv[j]))[0]
        assert dinv == pow(hu, -1, SC.ELL), j
