"""Executable carry-bound analysis for the radix-2^13 field arithmetic.

Round-4 NOTES.md flagged the relax-pass count after each field mul as a
~10-15% cost resting on a loose bound; the round-5 verdict asked for a
proven tighter count or a written argument.  This file IS the argument, as
code: an interval propagator mirrors every limb operation (conv, top-limb
fold, mask, shift, wrap-roll) on per-limb upper BOUNDS — exactly the ops in
ops/field.py / ops/pallas_field.py — and asserts that the SHIPPED pass
counts drive worst-case inputs back into the weak-normal envelope with
every intermediate below 2^31.  Companion tests drive actual all-limbs-max
values through the real kernels against the python-int oracle.

The propagator proves 3 passes suffice for the mul/sq convolution under
weak-normal inputs (the historical 5 was calibrated to nothing); ops/
field.py and ops/pallas_field.py ship 3 and cite this file.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from cudabulletproof_tpu.ops import field as F, pallas_field as PF

W, MASK, L, FOLD = F.W, int(F.MASK), F.L, int(F.FOLD)
P = (1 << 255) - 19
B = 8800                 # weak-normal limb bound (closed form 8799) + margin
I31 = 1 << 31


def relax_bounds(t, passes):
    """Bound transfer of field._relax / pallas_field._carry_relax."""
    t = np.array(t, dtype=object)
    for _ in range(passes):
        assert (t < I31).all(), "int32 overflow before relax pass"
        carry = t >> W
        low = np.minimum(t, MASK)          # (x & MASK) <= min(x, MASK)
        add = np.roll(carry, 1)
        add[0] = carry[-1] * FOLD          # limb-19 carry wraps *608
        t = low + add
        assert (t < I31).all(), "int32 overflow after relax pass"
    return t


def conv_bound(xa, xb):
    """Bound transfer of the 39-coefficient schoolbook convolution."""
    c = np.zeros(2 * L - 1, dtype=object)
    for i in range(L):
        for j in range(L):
            c[i + j] += xa[i] * xb[j]
    return c


def sq_conv_bound(xa):
    """Bound transfer of _conv_sq (diagonal + doubled upper triangle)."""
    c = np.zeros(2 * L - 1, dtype=object)
    for i in range(L):
        c[2 * i] += xa[i] * xa[i]
        for j in range(i + 1, L):
            c[i + j] += 2 * xa[i] * xa[j]
    return c


def fold_bound(c):
    """Bound transfer of _fold_wide / mul_xla's top-limb fold."""
    c = np.array(c, dtype=object)
    while len(c) > L:
        main, top = c[:L], c[L:]
        k = len(top)
        out = np.array(main, dtype=object)
        wn = max(L, k + 1)
        out = np.concatenate([out, np.zeros(wn - L, dtype=object)])
        out[:k] += FOLD * np.minimum(top, MASK)
        out[1:k + 1] += FOLD * (top >> W)
        c = out
    assert (c < I31).all(), "int32 overflow after fold"
    return c


WEAK = np.full(L, B, dtype=object)


def assert_weak(t):
    assert (np.array(t) <= B).all(), f"not weak-normal: {t}"


def test_mul_three_passes_sufficient():
    c = conv_bound(WEAK, WEAK)
    assert (c < I31).all()
    assert_weak(relax_bounds(fold_bound(c), 3))


def test_sq_three_passes_sufficient():
    c = sq_conv_bound(WEAK)
    assert (c < I31).all()
    assert_weak(relax_bounds(fold_bound(c), 3))


def test_mul_two_passes_insufficient():
    # the proof is tight at 3: 2 passes leave limb 0 above the envelope
    out = relax_bounds(fold_bound(conv_bound(WEAK, WEAK)), 2)
    assert (np.array(out) > B).any()


def test_add_two_passes():
    assert_weak(relax_bounds(WEAK + WEAK, 2))


def test_sub_two_passes():
    # a + (K - b): K limbs are 2*MASK (2*MASK - 1214 at limb 0), b >= 0
    k = np.full(L, 2 * MASK, dtype=object)
    k[0] = 2 * MASK - 1214
    assert_weak(relax_bounds(WEAK + k, 2))


def test_dbl2_two_passes():
    # pallas_curve._pdbl's zz2 = relax(sq(z) * 2, 2)
    sq_out = relax_bounds(fold_bound(sq_conv_bound(WEAK)), 3)
    assert_weak(relax_bounds(2 * np.array(sq_out), 2))


def test_normalize_weak_three_passes():
    # field.normalize_weak's contract: any non-negative limbs < 2^31
    # (mul_small products, inner-product fold outputs) -> weak normal
    assert_weak(relax_bounds(np.full(L, I31 - 1, dtype=object), 3))


def test_normalize_weak_values_oracle():
    rng = np.random.default_rng(9)
    raw = rng.integers(0, I31, (8, L), dtype=np.int64).astype(np.int32)
    got = np.asarray(F.normalize_weak(jnp.asarray(raw)))
    for r in range(8):
        assert _limbs_to_int(got[r]) % P == _limbs_to_int(raw[r]) % P
        assert got[r].max() <= B


def _limbs_to_int(row):
    return sum(int(v) << (W * i) for i, v in enumerate(row))


@pytest.mark.parametrize("maker", ["mul", "sq"])
def test_worst_case_values_oracle(maker):
    """All-limbs-at-bound inputs (unreachable by from_ints, representable
    by the weak-normal invariant) through the REAL kernels vs python ints."""
    a = jnp.full((4, L), 8799, jnp.int32)
    b = jnp.asarray(np.tile(np.arange(8796, 8800, dtype=np.int32)[:, None],
                            (1, L)))
    va = _limbs_to_int(np.full(L, 8799))
    if maker == "mul":
        got = np.asarray(PF.mul(a, b))
        for r in range(4):
            vb = _limbs_to_int(np.asarray(b)[r])
            assert _limbs_to_int(got[r]) % P == va * vb % P
            assert got[r].max() <= B
    else:
        got = np.asarray(PF.sq(a))
        for r in range(4):
            assert _limbs_to_int(got[r]) % P == va * va % P
            assert got[r].max() <= B


def test_worst_case_values_oracle_xla():
    a = jnp.full((2, L), 8799, jnp.int32)
    got = np.asarray(F.mul(a, a))
    va = _limbs_to_int(np.full(L, 8799))
    for r in range(2):
        assert _limbs_to_int(got[r]) % P == va * va % P
        assert got[r].max() <= B
