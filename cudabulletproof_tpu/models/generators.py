"""Deterministic generator setup for Pedersen commitments and the IPA.

The reference derives G[i]/H[i]/g/h from SHA-256 but the results are not
points on the curve (complete_bulletproof_test.cu:33-63, 84-109;
ge25519_is_on_curve is a stub).  Here generators are real prime-order-subgroup
points via try-and-increment hash-to-curve + cofactor clearing
(utils/oracle.hash_to_point), derived once on host and cached as device GE
batches.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax

from ..ops import curve as C
from ..utils import oracle


@dataclass(frozen=True)
class Generators:
    """g: value generator, h: blinding generator, G/H: IPA vector generators."""
    n: int
    g: C.GE          # unbatched
    h: C.GE
    G: C.GE          # batched [n]
    H: C.GE          # batched [n]
    # host-side oracle copies (exact ints) for tests / host fallback path
    g_pt: oracle.Point
    h_pt: oracle.Point
    G_pts: tuple
    H_pts: tuple


@functools.lru_cache(maxsize=None)
def _oracle_gens(n: int):
    g = oracle.hash_to_point(b"/g", 0)
    h = oracle.hash_to_point(b"/h", 0)
    G = tuple(oracle.hash_to_point(b"/G", i) for i in range(n))
    H = tuple(oracle.hash_to_point(b"/H", i) for i in range(n))
    return g, h, G, H


@functools.lru_cache(maxsize=None)
def get_generators(n: int) -> Generators:
    g, h, G, H = _oracle_gens(n)
    return Generators(
        n=n,
        g=C.from_oracle([g]), h=C.from_oracle([h]),
        G=C.from_oracle(list(G)), H=C.from_oracle(list(H)),
        g_pt=g, h_pt=h, G_pts=G, H_pts=H,
    )
