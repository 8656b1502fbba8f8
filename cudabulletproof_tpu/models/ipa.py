"""Inner-product argument (log-round) — prover and one-shot verifier.

Statement: P = <a, G> + <b, H> + <a,b> * Q for secret vectors a, b.

Prover parity: inner_product_prove (bulletproof_vectors.cu:277-538) — same
round structure (c_L = <a_L, b_R>, L = <a_L, G_R> + <b_R, H_L> + c_L*Q, ...),
with the challenge domain "InnerProductChal" (bulletproof_vectors.cu:448-462).
Scalar folds run on host mod l; every group op (L/R commitments, generator
folds) is a device MSM.

Verifier: instead of the reference's explicit per-round G'/H' fold with
host-side scalarmults (bulletproof_vectors.cu:541-762) we use the standard
one-shot verification: expand the fold coefficients s_i = prod_j u_j^{+-1}
and check a single (2n + 2 log n + 2)-term MSM against the identity — exact
point equality, no fuzzy acceptance (the reference's relaxed comparisons at
bulletproof_vectors.cu:713-749 exist only to mask its broken field inverse).
"""
from __future__ import annotations

from dataclasses import dataclass, field as dfield

import jax.numpy as jnp
import numpy as np

from ..ops import curve as C, field as F, msm as M
from ..utils import scalars as S
from .transcript import Transcript

IPA_DOMAIN = b"InnerProductChal"   # bulletproof_vectors.cu:448-462


@dataclass
class InnerProductProof:
    """Reference parity: InnerProductProof struct (bulletproof_vectors.h:65-74)
    {n, a, b, c, L[], R[]} — c is redundant (= a*b) and omitted on the wire."""
    n: int
    L: list          # list[bytes] compressed points, len = log2(n)
    R: list
    a: int
    b: int


def _compress_pair(l_pt: C.GE, r_pt: C.GE):
    pair = C.GE(*(jnp.stack([a, b]) for a, b in zip(l_pt, r_pt)))
    both = np.asarray(C.to_bytes_batch(pair))
    return bytes(both[0].tolist()), bytes(both[1].tolist())


def prove(G: C.GE, H: C.GE, Q: C.GE, a, b, transcript: Transcript) -> InnerProductProof:
    """a, b: lists of python ints (mod l); G/H: device GE [n]; Q: GE."""
    n = len(a)
    assert n & (n - 1) == 0 and n >= 1
    a, b = list(a), list(b)
    L_out, R_out = [], []
    while n > 1:
        h = n // 2
        a_L, a_R = a[:h], a[h:]
        b_L, b_R = b[:h], b[h:]
        c_L = S.vec_inner(a_L, b_R)
        c_R = S.vec_inner(a_R, b_L)
        G_L = C.GE(*(c[:h] for c in G))
        G_R = C.GE(*(c[h:] for c in G))
        H_L = C.GE(*(c[:h] for c in H))
        H_R = C.GE(*(c[h:] for c in H))
        # L = <a_L, G_R> + <b_R, H_L> + c_L Q ; R = <a_R, G_L> + <b_L, H_R> + c_R Q
        L_pt = M.msm_ints(M.concat_ge(G_R, H_L, Q), a_L + b_R + [c_L])
        R_pt = M.msm_ints(M.concat_ge(G_L, H_R, Q), a_R + b_L + [c_R])
        L_b, R_b = _compress_pair(L_pt, R_pt)
        transcript.append_point(b"ipL", L_b)
        transcript.append_point(b"ipR", R_b)
        u = transcript.challenge(IPA_DOMAIN)
        u_inv = S.sc_inv(u)
        a = [(u * x + u_inv * y) % S.ELL for x, y in zip(a_L, a_R)]
        b = [(u_inv * x + u * y) % S.ELL for x, y in zip(b_L, b_R)]
        G = M.fold_generators(G_L, G_R, F.from_int(u_inv, (h,)), F.from_int(u, (h,)))
        H = M.fold_generators(H_L, H_R, F.from_int(u, (h,)), F.from_int(u_inv, (h,)))
        L_out.append(L_b)
        R_out.append(R_b)
        n = h
    return InnerProductProof(n=1 << len(L_out), L=L_out, R=R_out, a=a[0], b=b[0])


def challenges_from_transcript(proof: InnerProductProof, transcript: Transcript):
    """Re-derive per-round challenges u_j (verifier side)."""
    us = []
    for L_b, R_b in zip(proof.L, proof.R):
        transcript.append_point(b"ipL", L_b)
        transcript.append_point(b"ipR", R_b)
        us.append(transcript.challenge(IPA_DOMAIN))
    return us


def fold_scalars(us, n: int):
    """s_i = prod_j u_j^{+1 if bit (logn-1-j) of i else -1}; returns (s, s_inv)."""
    k = len(us)
    assert n == 1 << k
    us_inv = [S.sc_inv(u) for u in us]
    s = []
    for i in range(n):
        acc = 1
        for j in range(k):
            bit = (i >> (k - 1 - j)) & 1
            acc = acc * (us[j] if bit else us_inv[j]) % S.ELL
        s.append(acc)
    # (n-1-i) complements every bit of i, so s_{n-1-i} = s_i^{-1} exactly
    s_inv = list(reversed(s))
    return s, s_inv


def verify(G: C.GE, H: C.GE, Q: C.GE, P: C.GE, c_claim: int,
           proof: InnerProductProof, transcript: Transcript) -> bool:
    """Standalone IPA verification (P must commit to <a,b> via Q with c=<a,b>
    implicit): checks P == <a s, G> + <b s^{-1}, H> + ab Q - sum(...) exactly."""
    n = proof.n
    if len(proof.L) != len(proof.R) or (1 << len(proof.L)) != n:
        return False
    us = challenges_from_transcript(proof, transcript)
    s, s_inv = fold_scalars(us, n)
    a, b = proof.a % S.ELL, proof.b % S.ELL
    if c_claim is not None and (a * b) % S.ELL != c_claim % S.ELL:
        return False
    g_sc = [a * si % S.ELL for si in s]
    h_sc = [b * si % S.ELL for si in s_inv]
    q_sc = a * b % S.ELL
    L_pts, ok_l = C.from_bytes(jnp.asarray(
        np.stack([np.frombuffer(x, dtype=np.uint8) for x in proof.L])
        if proof.L else np.zeros((0, 32), np.uint8)))
    R_pts, ok_r = C.from_bytes(jnp.asarray(
        np.stack([np.frombuffer(x, dtype=np.uint8) for x in proof.R])
        if proof.R else np.zeros((0, 32), np.uint8)))
    if proof.L and not (bool(jnp.all(ok_l)) and bool(jnp.all(ok_r))):
        return False
    l_sc = [(-u * u) % S.ELL for u in us]
    r_sc = [(-S.sc_inv(u) ** 2) % S.ELL for u in us]
    bases = M.concat_ge(G, H, Q, P, L_pts, R_pts) if proof.L else \
        M.concat_ge(G, H, Q, P)
    sc = g_sc + h_sc + [q_sc, S.ELL - 1] + l_sc + r_sc
    res = M.msm_ints(bases, sc)
    return bool(C.is_identity(res))
