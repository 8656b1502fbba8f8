"""fe25519 limb arithmetic vs the exact Python-int oracle (SURVEY.md §7 step 1)."""
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cudabulletproof_tpu.ops import field as F

P = F.P


def rand_ints(rng, n, bound=None):
    bound = bound or (1 << 256)  # includes non-reduced (weakly normalized) range
    return [rng.randrange(bound) for _ in range(n)]


def test_roundtrip_int(rng):
    xs = rand_ints(rng, 50, P) + [0, 1, P - 1, P - 19, (1 << 255) - 20]
    arr = F.from_ints(xs)
    back = F.to_ints(arr)
    assert back == [x % P for x in xs]


def test_add_sub_neg(rng):
    xs = rand_ints(rng, 64) + [0, P - 1, P, 2 * P - 1, (1 << 256) - 1]
    ys = rand_ints(rng, len(xs))
    a = F.from_ints(xs)
    b = F.from_ints(ys)
    add = F.to_ints(F.add(a, b))
    sub = F.to_ints(F.sub(a, b))
    ng = F.to_ints(F.neg(b))
    for x, y, s, d, n in zip(xs, ys, add, sub, ng):
        assert s % P == (x + y) % P
        assert d % P == (x - y) % P
        assert n % P == (-y) % P
    # weak normalization invariant (relaxed bound, see field.py)
    for r in [F.add(a, b), F.sub(a, b), F.neg(b)]:
        assert int(jnp.max(r)) <= F.BOUND
        assert int(jnp.min(r)) >= 0


def test_mul_sq(rng):
    xs = rand_ints(rng, 64) + [0, 1, P - 1, P + 1]
    ys = rand_ints(rng, len(xs))
    a, b = F.from_ints(xs), F.from_ints(ys)
    m = F.to_ints(F.mul(a, b))
    s = F.to_ints(F.sq(a))
    for x, y, mm, ss in zip(xs, ys, m, s):
        assert mm % P == (x * y) % P
        assert ss % P == (x * x) % P
    assert int(jnp.max(F.mul(a, b))) <= F.BOUND


def test_invert(rng):
    xs = rand_ints(rng, 16, P - 1)
    xs = [x + 1 for x in xs] + [1, 2, P - 1]
    a = F.from_ints(xs)
    inv = F.to_ints(jax.jit(F.invert)(a))
    for x, i in zip(xs, inv):
        assert (x * i) % P == 1
        assert i % P == pow(x, P - 2, P)


def test_pow2523(rng):
    xs = [x + 1 for x in rand_ints(rng, 8, P - 1)]
    a = F.from_ints(xs)
    got = F.to_ints(jax.jit(F.pow2523)(a))
    for x, g in zip(xs, got):
        assert g % P == pow(x, (P - 5) // 8, P)


def test_bytes_roundtrip(rng):
    xs = rand_ints(rng, 32, P) + [0, 1, P - 1]
    a = F.from_ints(xs)
    b = F.to_bytes(a)
    assert b.dtype == jnp.uint8
    for x, row in zip(xs, np.asarray(b)):
        assert int.from_bytes(bytes(row.tolist()), "little") == x % P
    back = F.to_ints(F.from_bytes(b))
    assert [v % P for v in back] == [x % P for x in xs]


def test_canonical_reduces_weak_values(rng):
    # weakly-normalized values in [p, 2^256): canonical() must reduce exactly
    xs = [P + x for x in rand_ints(rng, 16, P)] + [P, 2 * P, (1 << 256) - 1]
    a = F.from_ints([0] * len(xs))
    # build limb arrays holding the *unreduced* values directly
    raw = np.zeros((len(xs), F.L), dtype=np.int32)
    for j, x in enumerate(xs):
        for i in range(F.L):
            raw[j, i] = (x >> (F.W * i)) & F.MASK
    got = F.to_ints(F.canonical(jnp.asarray(raw)))
    assert got == [x % P for x in xs]


def test_eq_and_is_zero(rng):
    xs = rand_ints(rng, 8, P)
    a = F.from_ints(xs)
    b = F.from_ints([x + P for x in xs])  # same residues, different encoding
    assert bool(jnp.all(F.eq(a, b)))
    assert bool(jnp.all(F.is_zero(F.sub(a, b))))
    c = F.from_ints([x + 1 for x in xs])
    assert not bool(jnp.any(F.eq(a, c)))


def test_cswap():
    a = F.from_ints([5, 7])
    b = F.from_ints([11, 13])
    swap = jnp.array([1, 0], dtype=jnp.int32)
    x, y = F.cswap(swap, a, b)
    assert F.to_ints(x) == [11, 7]
    assert F.to_ints(y) == [5, 13]


def test_mul_small(rng):
    xs = rand_ints(rng, 8)
    a = F.from_ints(xs)
    got = F.to_ints(F.mul_small(a, 121666))
    for x, g in zip(xs, got):
        assert g % P == (x * 121666) % P


def test_batch_invert(rng):
    xs = [x + 1 for x in rand_ints(rng, 33, P - 1)]
    a = F.from_ints(xs)
    inv = F.to_ints(jax.jit(F.batch_invert)(a))
    for x, i in zip(xs, inv):
        assert (x * i) % P == 1


def test_vmap_and_nd_shapes(rng):
    xs = rand_ints(rng, 12)
    ys = rand_ints(rng, 12)
    a = F.from_ints(xs).reshape(3, 4, F.L)
    b = F.from_ints(ys).reshape(3, 4, F.L)
    out = jax.vmap(F.mul)(a, b)
    flat = F.to_ints(out.reshape(12, F.L))
    for x, y, m in zip(xs, ys, flat):
        assert m % P == (x * y) % P
