"""Differential tests: ops/scalar_field.py (device mod-l limbs) vs python ints.

Strategy mirrors tests/test_field.py: every op is checked against exact
python-int arithmetic mod l, including adversarial values (0, 1, l-1, l,
2^252 boundary straddlers, all-WEAK-limb weak forms)."""
import random

import jax.numpy as jnp
import numpy as np
import pytest

from cudabulletproof_tpu.ops import scalar_field as SC
from cudabulletproof_tpu.utils.oracle import ELL


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)


def edge_values(rng, n=24):
    vals = [0, 1, 2, ELL - 1, ELL - 2, (1 << 252) - 1, 1 << 252,
            (1 << 252) + 1, SC.DELTA, ELL // 2]
    vals += [rng.randrange(ELL) for _ in range(n - len(vals))]
    return vals


def test_roundtrip_int(rng):
    vals = edge_values(rng)
    arr = SC.from_ints(vals)
    assert SC.to_ints(arr) == vals


def test_weak_forms_canonicalize(rng):
    """Weak (limbs up to WEAK, value >= l) forms reduce to the right value."""
    raws = []
    wants = []
    for _ in range(16):
        limbs = [rng.randrange(SC.WEAK + 1) for _ in range(SC.SL)]
        raws.append(limbs)
        wants.append(sum(v << (SC.SW * i) for i, v in enumerate(limbs)) % ELL)
    x = jnp.asarray(np.array(raws, dtype=np.int32))
    got = SC.to_ints(SC.canonical(x))
    assert got == wants
    for g in got:
        assert 0 <= g < ELL


def test_add_sub_neg(rng):
    a = edge_values(rng)
    b = list(reversed(a))
    A, B = SC.from_ints(a), SC.from_ints(b)
    assert SC.to_ints(SC.canonical(SC.add(A, B))) == \
        [(x + y) % ELL for x, y in zip(a, b)]
    assert SC.to_ints(SC.canonical(SC.sub(A, B))) == \
        [(x - y) % ELL for x, y in zip(a, b)]
    assert SC.to_ints(SC.canonical(SC.neg(A))) == [(-x) % ELL for x in a]


def test_mul_matches_oracle(rng):
    a = edge_values(rng)
    b = list(reversed(a))
    got = SC.to_ints(SC.canonical(SC.mul(SC.from_ints(a), SC.from_ints(b))))
    assert got == [x * y % ELL for x, y in zip(a, b)]


def test_mul_weak_inputs(rng):
    """mul must accept weak (non-canonical) inputs — the add/mul chains in
    the prover never canonicalize between steps."""
    raws = [[rng.randrange(SC.WEAK + 1) for _ in range(SC.SL)]
            for _ in range(8)]
    vals = [sum(v << (SC.SW * i) for i, v in enumerate(r)) % ELL for r in raws]
    x = jnp.asarray(np.array(raws, dtype=np.int32))
    got = SC.to_ints(SC.canonical(SC.mul(x, x)))
    assert got == [v * v % ELL for v in vals]


def test_sum_and_inner(rng):
    a = [rng.randrange(ELL) for _ in range(33)]
    b = [rng.randrange(ELL) for _ in range(33)]
    A, B = SC.from_ints(a), SC.from_ints(b)
    assert SC.to_ints(SC.canonical(SC.sum_mod(A)[None]))[0] == sum(a) % ELL
    assert SC.to_ints(SC.canonical(SC.inner(A, B)[None]))[0] == \
        sum(x * y for x, y in zip(a, b)) % ELL


def test_invert(rng):
    vals = [1, 2, ELL - 1] + [rng.randrange(1, ELL) for _ in range(5)]
    got = SC.to_ints(SC.canonical(SC.invert(SC.from_ints(vals))))
    assert got == [pow(v, ELL - 2, ELL) for v in vals]


def test_batch_invert(rng):
    vals = [rng.randrange(1, ELL) for _ in range(9)]
    got = SC.to_ints(SC.canonical(SC.batch_invert(SC.from_ints(vals))))
    assert got == [pow(v, ELL - 2, ELL) for v in vals]


def test_powers(rng):
    base = rng.randrange(ELL)
    for n in (1, 2, 7, 16):
        got = SC.to_ints(SC.canonical(SC.powers(SC.from_int(base), n)))
        want, acc = [], 1
        for _ in range(n):
            want.append(acc)
            acc = acc * base % ELL
        assert got == want


def test_bytes_roundtrip(rng):
    vals = edge_values(rng)
    arr = SC.from_ints(vals)
    b = SC.to_bytes(arr)
    assert [bytes(r.tolist()) for r in np.asarray(b)] == \
        [v.to_bytes(32, "little") for v in vals]
    back = SC.canonical(SC.from_bytes(b))
    assert SC.to_ints(back) == vals


def test_from_bytes_unreduced(rng):
    """from_bytes accepts any 256-bit value; canonical reduces mod l."""
    raw = [rng.randrange(1 << 256) for _ in range(8)] + [(1 << 256) - 1]
    blobs = np.stack([np.frombuffer(v.to_bytes(32, "little"), dtype=np.uint8)
                      for v in raw])
    got = SC.to_ints(SC.canonical(SC.from_bytes(jnp.asarray(blobs))))
    assert got == [v % ELL for v in raw]


def test_to_field_limbs(rng):
    from cudabulletproof_tpu.ops import field as F
    vals = edge_values(rng)
    fl = SC.to_field_limbs(SC.from_ints(vals))
    assert F.to_ints(fl) == vals
