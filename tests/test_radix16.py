"""Tests for the EXPERIMENTAL radix-2^16 field representation
(ops/radix16.py) — conversions and the split-operand mul/sq kernels,
all cross-checked against the python-int oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from cudabulletproof_tpu.ops import field as F, radix16 as R

P = R.P_INT
VALS = [0, 1, 19, (1 << 255) - 20, (1 << 255) - 19 - 1, 1 << 200,
        0x1234567890ABCDEF1234567890ABCDEF1234567890ABCDEF,
        P - 1, (P + 5) % P, 2**252 + 27742317777372353535851937790883648493]


def test_int_round_trip():
    for v in VALS:
        assert R.to_int(R.from_int(v)) == v % P


def test_from_radix13_matches():
    a13 = F.from_ints(VALS)
    a16 = R.from_radix13(a13)
    for row, v in zip(np.asarray(a16), VALS):
        assert sum(int(c) << (16 * i) for i, c in enumerate(row)) % P == v % P
        assert row.max() <= (1 << 16) + R.FOLD16


def test_from_radix13_weak_normal_inputs():
    # weak-normal radix-13 limbs (value above 2^255) must repack exactly
    a13 = F.from_ints(VALS)
    bumped = jnp.asarray(np.asarray(a13) + 600)
    extra = sum(600 << (13 * i) for i in range(F.L))
    a16 = R.from_radix13(bumped)
    for row, v in zip(np.asarray(a16), VALS):
        got = sum(int(c) << (16 * i) for i, c in enumerate(row)) % P
        assert got == (v + extra) % P


@pytest.mark.parametrize("reps", [1, 2, 5])
def test_mul_chain_oracle(reps):
    rng = np.random.default_rng(3)
    av = [int.from_bytes(rng.bytes(31), "little") for _ in range(4)]
    bv = [int.from_bytes(rng.bytes(31), "little") for _ in range(4)]
    a = jnp.asarray(np.stack([R.from_int(v) for v in av]))
    b = jnp.asarray(np.stack([R.from_int(v) for v in bv]))
    got = np.asarray(R.mul_chain(a, b, reps=reps))
    for k in range(4):
        want = av[k] % P
        for _ in range(reps):
            want = want * bv[k] % P
        assert R.to_int(got[k]) == want
        assert got[k].max() <= (1 << 16) + R.FOLD16


def test_mul_sq_match():
    rng = np.random.default_rng(4)
    vals = [int.from_bytes(rng.bytes(31), "little") for _ in range(8)]
    a = jnp.asarray(np.stack([R.from_int(v) for v in vals]))
    m = np.asarray(R.mul(a, a))
    s = np.asarray(R.sq(a))
    for k, v in enumerate(vals):
        assert R.to_int(m[k]) == v * v % P
        assert R.to_int(s[k]) == v * v % P
