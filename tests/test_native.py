"""Native C++ layer: differential tests vs the python-int oracle and the JAX
layer, plus cross-implementation proof interop (C++ prove -> JAX verify and
vice versa).  The two implementations share only the wire/transcript spec —
different radices (5x51 vs 20x13), different languages — so agreement is
strong evidence of correctness.
"""
import random

import numpy as np
import pytest

from cudabulletproof_tpu.utils import native, oracle, scalars as S

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

P = oracle.P


def fe_bytes(x):
    return (x % P).to_bytes(32, "little")


def test_batch_field_ops_vs_python(rng):
    n = 64
    xs = [rng.randrange(P) for _ in range(n)]
    ys = [rng.randrange(P) for _ in range(n)]
    a = b"".join(fe_bytes(x) for x in xs)
    b = b"".join(fe_bytes(y) for y in ys)
    for op, want in [
        ("mul", [(x * y) % P for x, y in zip(xs, ys)]),
        ("add", [(x + y) % P for x, y in zip(xs, ys)]),
        ("sub", [(x - y) % P for x, y in zip(xs, ys)]),
    ]:
        out = native.batch_field_op(op, a, b, n)
        got = [int.from_bytes(out[32*i:32*i+32], "little") for i in range(n)]
        assert got == want, op
    out = native.batch_field_op("square", a, None, n)
    got = [int.from_bytes(out[32*i:32*i+32], "little") for i in range(n)]
    assert got == [x * x % P for x in xs]
    out = native.batch_field_op("invert", a, None, n)
    got = [int.from_bytes(out[32*i:32*i+32], "little") for i in range(n)]
    assert got == [pow(x, P - 2, P) for x in xs]


def test_point_ops_vs_oracle(rng):
    pts = [oracle.hash_to_point(b"nat", i) for i in range(4)]
    scs = [rng.randrange(S.ELL) for _ in range(4)]
    # scalarmult
    got = native.point_scalarmult(pts[0].compress(), scs[0].to_bytes(32, "little"))
    assert got == (scs[0] * pts[0]).compress()
    # msm
    pbytes = b"".join(p.compress() for p in pts)
    sbytes = b"".join(s.to_bytes(32, "little") for s in scs)
    got = native.point_msm(pbytes, sbytes, 4)
    want = oracle.IDENTITY
    for p, s in zip(pts, scs):
        want = want + s * p
    assert got == want.compress()


def test_generators_match_python(rng):
    for label, idx in [(b"/g", 0), (b"/h", 0), (b"/G", 3), (b"/H", 7)]:
        got = native.hash_to_point(label, idx)
        want = oracle.hash_to_point(label, idx).compress()
        assert got == want, (label, idx)


def test_native_prove_native_verify():
    proof = native.prove_range(42, S.sc_random(), 16)
    assert proof is not None
    assert native.verify_range(proof)
    # tamper
    bad = bytearray(proof)
    bad[200] ^= 1
    assert not native.verify_range(bytes(bad))
    # out of range refused by prover
    assert native.prove_range(1 << 16, S.sc_random(), 16) is None


def test_cross_native_prove_jax_verify():
    from cudabulletproof_tpu.models import rangeproof as rp
    from cudabulletproof_tpu.models.generators import get_generators
    from cudabulletproof_tpu.utils.serialization import deserialize_range_proof
    wire = native.prove_range(42, S.sc_random(), 16)
    assert wire is not None
    proof = deserialize_range_proof(wire)
    assert rp.verify(proof, get_generators(16))


def test_cross_jax_prove_native_verify():
    from cudabulletproof_tpu.models import rangeproof as rp
    from cudabulletproof_tpu.models.generators import get_generators
    from cudabulletproof_tpu.utils.serialization import (
        deserialize_range_proof, serialize_range_proof)
    gens = get_generators(16)
    proof = rp.prove(42, S.sc_random(), 16, gens)
    wire = serialize_range_proof(proof)
    assert native.verify_range(wire)
    # round-trip through bytes back into the JAX verifier too
    assert rp.verify(deserialize_range_proof(wire), gens)


def test_native_rejects_small_order_points():
    """Torsion safety in the C++ path: small-order proof points rejected."""
    from cudabulletproof_tpu.models import rangeproof as rp
    from cudabulletproof_tpu.utils import serialization
    blob = native.prove_range(42, 7, 16)
    assert blob and native.verify_range(blob)
    proof = serialization.deserialize_range_proof(blob)
    import dataclasses
    tor = oracle.small_order_points()
    for enc in (tor[0].compress(), tor[1].compress()):
        bad = dataclasses.replace(proof, A=enc)
        assert not native.verify_range(serialization.serialize_range_proof(bad))
