"""Pallas field kernels vs the python-int oracle and the jnp field layer.

Bit-exactness contract (BASELINE.md: 'Batched fe25519 field ops as Pallas
kernels, bit-exact vs CPU'): equality is at value-mod-p / canonical-bytes
level; kernels output the relaxed weak normalization documented in
ops/pallas_field.py.
"""
import random

import jax.numpy as jnp
import numpy as np
import pytest

from cudabulletproof_tpu.ops import field as F
from cudabulletproof_tpu.ops import pallas_field as PF

P = F.P


def rand_ints(rng, n, bound=None):
    return [rng.randrange(bound or (1 << 256)) for _ in range(n)]


@pytest.mark.parametrize("n", [4, 256, 600])
def test_mul_kernel(rng, n):
    xs, ys = rand_ints(rng, n), rand_ints(rng, n)
    a, b = F.from_ints(xs), F.from_ints(ys)
    out = F.to_ints(PF.mul(a, b))
    for x, y, o in zip(xs, ys, out):
        assert o % P == (x * y) % P
    # relaxed weak-normalization invariant
    assert int(jnp.max(PF.mul(a, b))) <= (1 << F.W) + F.FOLD


def test_kernel_output_feeds_kernel_and_jnp_path(rng):
    """Closure: kernel outputs are valid inputs for both layers."""
    xs, ys, zs = rand_ints(rng, 64), rand_ints(rng, 64), rand_ints(rng, 64)
    a, b, c = F.from_ints(xs), F.from_ints(ys), F.from_ints(zs)
    ab = PF.mul(a, b)
    abc_kernel = F.to_ints(PF.mul(ab, c))
    abc_jnp = F.to_ints(F.mul(ab, c))
    for x, y, z, k, j in zip(xs, ys, zs, abc_kernel, abc_jnp):
        assert k % P == (x * y * z) % P
        assert j % P == (x * y * z) % P


def test_add_sub_sq_kernels(rng):
    xs, ys = rand_ints(rng, 300), rand_ints(rng, 300)
    a, b = F.from_ints(xs), F.from_ints(ys)
    for got, want in [
        (PF.add(a, b), [(x + y) % P for x, y in zip(xs, ys)]),
        (PF.sub(a, b), [(x - y) % P for x, y in zip(xs, ys)]),
        (PF.sq(a), [x * x % P for x in xs]),
    ]:
        for o, w in zip(F.to_ints(got), want):
            assert o % P == w


@pytest.mark.parametrize("n", [1, 8, 256, 1000])
def test_inner_product_kernel(rng, n):
    xs, ys = rand_ints(rng, n), rand_ints(rng, n)
    a, b = F.from_ints(xs), F.from_ints(ys)
    got = F.to_int(PF.inner_product(a, b))
    want = sum(x * y for x, y in zip(xs, ys)) % P
    assert got % P == want
