"""ops/pallas_sort.py: the counting-rank bucket partition vs numpy.

The pipeline's contract (pippenger._bucket_window) is ONLY that
digits[order] is grouped by digit value ascending — within-group order is
irrelevant because point addition is commutative.  We check the grouping
contract, permutation validity, and multi-pass (w > pass_bits) stability
interplay on sizes matching the MSM's (multiples of 1024).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from cudabulletproof_tpu.ops import pallas_sort


@pytest.mark.parametrize("n,w,pass_bits", [
    (1024, 4, 7),          # single pass, radix 16
    (1024, 7, 7),          # single pass, radix 128
    (2048, 13, 7),         # two passes (7+6) — the production w
    (4096, 13, 5),         # three passes (5+5+3)
])
def test_grouping_order_groups_ascending(n, w, pass_bits):
    rng = np.random.default_rng(n * 31 + w)
    digits = rng.integers(0, 1 << w, size=n).astype(np.int32)
    order = np.asarray(pallas_sort.grouping_order(
        jnp.asarray(digits), w, pass_bits))
    # a permutation …
    assert sorted(order.tolist()) == list(range(n))
    # … that groups ascending
    g = digits[order]
    assert (np.diff(g) >= 0).all()


def test_grouping_order_skewed_keys():
    """All-equal and one-hot digit distributions (empty buckets)."""
    n, w = 1024, 8
    for digits in (np.zeros(n, np.int32),
                   np.full(n, 255, np.int32),
                   np.r_[np.zeros(n - 1, np.int32), np.int32(7)]):
        order = np.asarray(pallas_sort.grouping_order(
            jnp.asarray(digits), w))
        assert sorted(order.tolist()) == list(range(n))
        assert (np.diff(digits[order]) >= 0).all()


def test_grouping_order_matches_argsort_grouping():
    """Bucket boundaries (counts per digit) must equal argsort's."""
    n, w = 2048, 13
    rng = np.random.default_rng(0)
    digits = rng.integers(0, 1 << w, size=n).astype(np.int32)
    order = np.asarray(pallas_sort.grouping_order(jnp.asarray(digits), w))
    ref = np.sort(digits)
    assert (digits[order] == ref).all()
