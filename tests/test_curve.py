"""ge25519 group law & serialization vs the exact oracle (SURVEY.md §7 step 2)."""
import random

import jax.numpy as jnp
import numpy as np
import pytest

from cudabulletproof_tpu.ops import curve as C
from cudabulletproof_tpu.ops import field as F
from cudabulletproof_tpu.utils import oracle


def rand_points(rng, n):
    return [oracle.hash_to_point(b"test", rng.randrange(1 << 30)) for i in range(n)]


def test_roundtrip_oracle(rng):
    pts = rand_points(rng, 4)
    ge = C.from_oracle(pts)
    back = C.to_oracle(ge)
    for p, q in zip(pts, back):
        assert p == q


def test_add_matches_oracle(rng):
    ps = rand_points(rng, 8)
    qs = rand_points(rng, 8)
    got = C.to_oracle(C.add(C.from_oracle(ps), C.from_oracle(qs)))
    for p, q, g in zip(ps, qs, got):
        assert g == p + q
        assert g.is_on_curve()


def test_add_identity_and_double(rng):
    ps = rand_points(rng, 4)
    ge = C.from_oracle(ps)
    idn = C.identity((4,))
    assert bool(jnp.all(C.eq(C.add(ge, idn), ge)))
    dbl = C.to_oracle(C.double(ge))
    for p, d in zip(ps, dbl):
        assert d == p + p


def test_neg_sub(rng):
    ps = rand_points(rng, 4)
    ge = C.from_oracle(ps)
    assert bool(jnp.all(C.is_identity(C.add(ge, C.neg(ge)))))
    assert bool(jnp.all(C.is_identity(C.sub(ge, ge))))


def test_scalarmult_matches_oracle(rng):
    ps = rand_points(rng, 4)
    ss = [rng.randrange(oracle.ELL) for _ in range(4)] + []
    ge = C.from_oracle(ps)
    sc = F.from_ints(ss)
    got = C.to_oracle(C.scalarmult(ge, sc))
    for p, s, g in zip(ps, ss, got):
        assert g == s * p


def test_scalarmult_edge_scalars(rng):
    p = rand_points(rng, 1)[0]
    for s in [0, 1, 2, oracle.ELL - 1, (1 << 253) - 1]:
        ge = C.from_oracle([p] )
        got = C.to_oracle(C.scalarmult(ge, F.from_ints([s])[0]))[0]
        assert got == s * p, s


def test_scalarmult_base(rng):
    s = rng.randrange(oracle.ELL)
    got = C.to_oracle(C.scalarmult_base(F.from_ints([s])[0]))[0]
    assert got == s * oracle.BASE


def test_compress_matches_oracle(rng):
    pts = rand_points(rng, 8)
    ge = C.from_oracle(pts)
    got = np.asarray(C.to_bytes(ge))
    got_b = np.asarray(C.to_bytes_batch(ge))
    for p, row, row_b in zip(pts, got, got_b):
        assert bytes(row.tolist()) == p.compress()
        assert bytes(row_b.tolist()) == p.compress()


def test_decompress(rng):
    pts = rand_points(rng, 8)
    comp = jnp.asarray(np.stack([
        np.frombuffer(p.compress(), dtype=np.uint8) for p in pts]))
    ge, valid = C.from_bytes(comp)
    assert bool(jnp.all(valid))
    back = C.to_oracle(ge)
    for p, q in zip(pts, back):
        assert p == q
    # corrupt: y >= p is invalid
    bad = np.full((1, 32), 0xFF, dtype=np.uint8)
    bad[0, 31] = 0x7F
    _, v = C.from_bytes(jnp.asarray(bad))
    assert not bool(v[0])


def test_on_curve_and_stub_replacement(rng):
    pts = rand_points(rng, 4)
    ge = C.from_oracle(pts)
    assert bool(jnp.all(C.is_on_curve(ge)))
    off = C.GE(ge.x, F.add(ge.y, F.ones((4,))), ge.z, ge.t)
    assert not bool(jnp.any(C.is_on_curve(off)))


def test_tree_reduce(rng):
    pts = rand_points(rng, 11)   # non-power-of-two
    ge = C.from_oracle(pts)
    got = C.to_oracle(C.tree_reduce(ge))[0]
    want = oracle.IDENTITY
    for p in pts:
        want = want + p
    assert got == want


def test_masked_tree_reduce(rng):
    pts = rand_points(rng, 8)
    mask = jnp.asarray([True, False] * 4)
    got = C.to_oracle(C.masked_tree_reduce(C.from_oracle(pts), mask))[0]
    want = oracle.IDENTITY
    for i, p in enumerate(pts):
        if i % 2 == 0:
            want = want + p
    assert got == want


def test_normalize(rng):
    pts = rand_points(rng, 4)
    ge = C.normalize_batch(C.from_oracle(pts))
    assert F.to_ints(ge.z) == [1] * 4
    for p, q in zip(pts, C.to_oracle(ge)):
        assert p == q


def test_small_order_and_cofactor_clearing(rng):
    """Torsion safety (round-2): E[8] detection matches the oracle's torsion
    subgroup; mul8 clears mixed-torsion components exactly."""
    tor = oracle.small_order_points()
    ge_tor = C.from_oracle(tor)
    assert bool(jnp.all(C.is_small_order(ge_tor)))
    assert bool(jnp.all(C.is_identity(C.mul8(ge_tor))))
    # prime-subgroup points are never small-order
    ps = rand_points(rng, 4)
    assert not bool(jnp.any(C.is_small_order(C.from_oracle(ps))))
    # mixed point P + T: not small-order, but mul8 lands on 8P
    mixed = [p + t for p, t in zip(ps, tor[1:5])]
    ge_mixed = C.from_oracle(mixed)
    assert not bool(jnp.any(C.is_small_order(ge_mixed)))
    cleared = C.mul8(ge_mixed)
    want = C.mul8(C.from_oracle(ps))
    assert bool(jnp.all(C.eq(cleared, want)))


def test_decompress_small_order_encodings():
    """The 8 canonical small-order encodings decompress as valid curve points
    (from_bytes is protocol-agnostic) but are flagged by is_small_order —
    the verifiers reject them at decompression."""
    import numpy as np
    tor = oracle.small_order_points()
    blobs = np.stack([np.frombuffer(t.compress(), dtype=np.uint8) for t in tor])
    pts, ok = C.from_bytes(jnp.asarray(blobs))
    assert bool(jnp.all(ok))
    assert bool(jnp.all(C.is_small_order(pts)))
