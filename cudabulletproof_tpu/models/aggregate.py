"""Aggregated range proofs (m values, one proof) and batched verification.

Aggregation (Bulletproofs §4.3): m values v_j each in [0, 2^n) share one
proof over N = n*m generators; proof size grows only by the extra V_j's and
log(m) IPA rounds.  This is new capability relative to the reference (which
proves a single 16-bit value; SURVEY.md §6 'largest MSM exercised is n=16')
and is the workload that drives the large sharded MSMs of BASELINE.md config
5 ('aggregated multi-proof batch verification at 2^20-point MSM').

batch_verify: verifies k independent single proofs with ONE MSM by taking a
random linear combination of their verification equations (standard batching:
soundness error 1/l per proof; bases G/H/g/h are shared across proofs so the
combined MSM has 2N + 4 + k*(7 + 2 log n) distinct points).
"""
from __future__ import annotations

import secrets
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..ops import curve as C, field as F, msm as M
from ..utils import scalars as S
from . import ipa
from .generators import Generators, get_generators
from .rangeproof import (DOMAIN_Q, DOMAIN_X, DOMAIN_Y, DOMAIN_Z, ProveError,
                         RangeProof, validate_range_input)
from .transcript import Transcript


@dataclass
class AggregatedRangeProof:
    n: int                # bits per value
    m: int                # number of values
    V: list               # m compressed commitments
    A: bytes
    S: bytes
    T1: bytes
    T2: bytes
    taux: int
    mu: int
    t_hat: int
    ip: ipa.InnerProductProof


def _base_transcript(n: int, m: int) -> Transcript:
    t = Transcript(b"tpu-bulletproofs/range-agg")
    t.append(b"n", n.to_bytes(4, "little"))
    t.append(b"m", m.to_bytes(4, "little"))
    return t


def prove(values, blindings, n: int, gens: Generators | None = None) -> AggregatedRangeProof:
    from .. import config
    config.require_exact()
    m = len(values)
    assert len(blindings) == m
    if m & (m - 1) != 0:
        raise ProveError("m must be a power of two")
    for v in values:
        if not validate_range_input(v, n):
            raise ProveError(f"value out of range [0, 2^{n})")
    N = n * m
    gens = gens or get_generators(N)
    assert gens.n >= N
    G = C.GE(*(c[:N] for c in gens.G))
    H = C.GE(*(c[:N] for c in gens.H))

    tr = _base_transcript(n, m)
    # all m value commitments in ONE fused multi-MSM dispatch
    V_list = M.msm_ints_multi(
        M.concat_ge(gens.g, gens.h),
        [[v % S.ELL, gamma % S.ELL] for v, gamma in zip(values, blindings)])
    for vb in V_list:
        tr.append_point(b"V", vb)

    aL = []
    for v in values:
        aL.extend((v >> i) & 1 for i in range(n))
    aR = [(x - 1) % S.ELL for x in aL]
    sL = [S.sc_random() for _ in range(N)]
    sR = [S.sc_random() for _ in range(N)]
    alpha, rho = S.sc_random(), S.sc_random()

    A_b, S_b = M.msm_ints_multi(M.concat_ge(gens.h, G, H),
                                [[alpha] + aL + aR, [rho] + sL + sR])
    tr.append_point(b"A", A_b)
    tr.append_point(b"S", S_b)
    y = tr.challenge(DOMAIN_Y)
    z = tr.challenge(DOMAIN_Z)

    y_N = S.vec_powers(y, N)
    z2 = z * z % S.ELL
    z_pows = S.vec_powers(z, m)           # z^j
    # r0[i] = y^i (aR_i + z) + z^(2+j(i)) * 2^(i mod n)
    l0 = [(x - z) % S.ELL for x in aL]
    l1 = sL
    r0, r1 = [], []
    for i in range(N):
        j = i // n
        zz = z2 * z_pows[j] % S.ELL
        r0.append((y_N[i] * ((aR[i] + z) % S.ELL) + zz * (1 << (i % n))) % S.ELL)
        r1.append(y_N[i] * sR[i] % S.ELL)

    t0 = S.vec_inner(l0, r0)
    t2 = S.vec_inner(l1, r1)
    t1 = (S.vec_inner(S.vec_add(l0, l1), S.vec_add(r0, r1)) - t0 - t2) % S.ELL

    tau1, tau2 = S.sc_random(), S.sc_random()
    T1_b, T2_b = M.msm_ints_multi(M.concat_ge(gens.g, gens.h),
                                  [[t1, tau1], [t2, tau2]])
    tr.append_point(b"T1", T1_b)
    tr.append_point(b"T2", T2_b)
    x = tr.challenge(DOMAIN_X)
    x2 = x * x % S.ELL

    l_vec = [(a + b * x) % S.ELL for a, b in zip(l0, l1)]
    r_vec = [(a + b * x) % S.ELL for a, b in zip(r0, r1)]
    t_hat = S.vec_inner(l_vec, r_vec)
    taux = (tau2 * x2 + tau1 * x
            + sum(z2 * zj % S.ELL * g for zj, g in zip(z_pows, blindings))) % S.ELL
    mu = (alpha + rho * x) % S.ELL

    tr.append_scalar(b"taux", taux)
    tr.append_scalar(b"mu", mu)
    tr.append_scalar(b"t", t_hat)
    w = tr.challenge(DOMAIN_Q)

    y_inv = S.sc_inv(y)
    y_inv_pows = S.vec_powers(y_inv, N)
    ip = ipa.prove(G, H, gens.g, l_vec, r_vec, tr,
                   q_weight=w, h_weights=y_inv_pows)
    return AggregatedRangeProof(n=n, m=m, V=V_list, A=A_b, S=S_b, T1=T1_b,
                                T2=T2_b, taux=taux, mu=mu, t_hat=t_hat, ip=ip)


def _delta_agg(y: int, z: int, n: int, m: int) -> int:
    N = n * m
    sum_y = 0
    acc = 1
    for _ in range(N):
        sum_y += acc
        acc = acc * y % S.ELL
    sum_2 = (1 << n) - 1
    z2 = z * z % S.ELL
    z3 = z2 * z % S.ELL
    total = (z - z2) * sum_y % S.ELL
    zj = z3
    for _ in range(m):
        total = (total - zj * sum_2) % S.ELL
        zj = zj * z % S.ELL
    return total % S.ELL


def _final_msm(bases: C.GE, sc: list, mesh) -> C.GE:
    """The verification multiexp, optionally sharded over a device mesh
    (points split over the 'dp' axis, one tiny gather+fold at the end —
    parallel/sharded_msm.py)."""
    if mesh is not None:
        from ..parallel.sharded_msm import msm_sharded_ints
        return msm_sharded_ints(bases, sc, mesh=mesh)
    return M.msm_ints(bases, sc)


def verify(proof: AggregatedRangeProof, gens: Generators | None = None,
           *, mesh=None) -> bool:
    """Aggregated verification: both checks merged into ONE MSM via a random
    linear combination (as rangeproof.verify does for single proofs) with a
    single batched decompression — one device dispatch chain in total.

    mesh: optional jax.sharding.Mesh — shards the verification MSM (the 2N
    G/H bases dominate) across devices; collectives ride ICI."""
    from .. import config
    config.require_exact()
    n, m = proof.n, proof.m
    if n < 1 or m < 1 or n & (n - 1) != 0 or m & (m - 1) != 0:
        return False
    N = n * m
    if proof.ip.n != N or (1 << len(proof.ip.L)) != N:
        return False
    gens = gens or get_generators(N)
    if gens.n < N or len(proof.V) != m:
        return False
    G = C.GE(*(c[:N] for c in gens.G))
    H = C.GE(*(c[:N] for c in gens.H))

    from .rangeproof import _decompress_all
    k = len(proof.ip.L)
    pts, ok = _decompress_all(list(proof.V)
                              + [proof.A, proof.S, proof.T1, proof.T2]
                              + list(proof.ip.L) + list(proof.ip.R))
    if not ok:
        return False
    V_pts = C.GE(*(c[:m] for c in pts))
    A_pt = C.GE(*(c[m] for c in pts))
    S_pt = C.GE(*(c[m + 1] for c in pts))
    T1_pt = C.GE(*(c[m + 2] for c in pts))
    T2_pt = C.GE(*(c[m + 3] for c in pts))
    L_pts = C.GE(*(c[m + 4:m + 4 + k] for c in pts))
    R_pts = C.GE(*(c[m + 4 + k:m + 4 + 2 * k] for c in pts))

    tr = _base_transcript(n, m)
    for vb in proof.V:
        tr.append_point(b"V", vb)
    tr.append_point(b"A", proof.A)
    tr.append_point(b"S", proof.S)
    y = tr.challenge(DOMAIN_Y)
    z = tr.challenge(DOMAIN_Z)
    tr.append_point(b"T1", proof.T1)
    tr.append_point(b"T2", proof.T2)
    x = tr.challenge(DOMAIN_X)
    tr.append_scalar(b"taux", proof.taux)
    tr.append_scalar(b"mu", proof.mu)
    tr.append_scalar(b"t", proof.t_hat)
    w = tr.challenge(DOMAIN_Q)

    z2 = z * z % S.ELL
    x2 = x * x % S.ELL
    z_pows = S.vec_powers(z, m)
    delta = _delta_agg(y, z, n, m)
    t_hat = proof.t_hat % S.ELL

    # random weights merging check 1 (polynomial identity) and check 2
    # (P-reconstruction + one-shot IPA); soundness error 1/l
    r1 = secrets.randbelow(S.ELL - 1) + 1
    r2 = secrets.randbelow(S.ELL - 1) + 1

    us = ipa.challenges_from_transcript(proof.ip, tr)
    s, s_inv = ipa.fold_scalars(us, N)
    a, b = proof.ip.a % S.ELL, proof.ip.b % S.ELL
    y_inv = S.sc_inv(y)
    y_inv_pows = S.vec_powers(y_inv, N)

    g_sc = [r2 * ((a * si + z) % S.ELL) % S.ELL for si in s]
    h_sc = []
    for i in range(N):
        j = i // n
        zz = z2 * z_pows[j] % S.ELL
        coeff = (b * s_inv[i] % S.ELL * y_inv_pows[i]
                 - z - zz * (1 << (i % n)) % S.ELL * y_inv_pows[i]) % S.ELL
        h_sc.append(r2 * coeff % S.ELL)
    sc_g = (r1 * ((t_hat - delta) % S.ELL)
            + r2 * ((a * b - t_hat) % S.ELL * w % S.ELL)) % S.ELL
    sc_h = (r1 * proof.taux + r2 * proof.mu) % S.ELL
    sc_v = [(S.ELL - r1 * (z2 * zj % S.ELL) % S.ELL) % S.ELL for zj in z_pows]
    sc = (g_sc + h_sc + [sc_g, sc_h]
          + sc_v
          + [(S.ELL - r1 * x % S.ELL) % S.ELL,
             (S.ELL - r1 * x2 % S.ELL) % S.ELL,
             (S.ELL - r2) % S.ELL,
             (S.ELL - r2 * x % S.ELL) % S.ELL]
          + [(S.ELL - r2 * (u * u % S.ELL) % S.ELL) % S.ELL for u in us]
          + [(S.ELL - r2 * pow(S.sc_inv(u), 2, S.ELL) % S.ELL) % S.ELL
             for u in us])
    bases = M.concat_ge(G, H, gens.g, gens.h, V_pts, T1_pt, T2_pt,
                        A_pt, S_pt, L_pts, R_pts)
    res = _final_msm(bases, sc, mesh)
    return bool(C.is_identity(C.mul8(res)))       # cofactored check


def batch_verify(proofs: list, gens: Generators | None = None,
                 *, mesh=None) -> bool:
    """Verify k single range proofs (same n) with ONE random-linear-combination
    MSM.  Sound: a cheating proof passes with probability ~2/l."""
    from .. import config
    config.require_exact()
    if not proofs:
        return True
    n = proofs[0].n
    if any(p.n != n for p in proofs):
        return False
    gens = gens or get_generators(n)
    G = C.GE(*(c[:n] for c in gens.G))
    H = C.GE(*(c[:n] for c in gens.H))

    from .rangeproof import (_decompress_all, _base_transcript as single_tr,
                             compute_delta)
    k = n.bit_length() - 1
    blobs = []
    for proof in proofs:
        if proof.ip.n != n or (1 << len(proof.ip.L)) != n:
            return False
        blobs += [proof.V, proof.A, proof.S, proof.T1, proof.T2]
        blobs += list(proof.ip.L) + list(proof.ip.R)
    # ONE batched decompression for every point of every proof
    all_pts, ok = _decompress_all(blobs)
    if not ok:
        return False
    stride = 5 + 2 * k

    g_acc = [0] * n
    h_acc = [0] * n
    g_single = 0
    h_single = 0
    extra_idx = []      # indices into all_pts (avoid per-proof device slicing)
    extra_sc = []

    for pi, proof in enumerate(proofs):
        base = pi * stride
        tr = single_tr(n)
        tr.append_point(b"V", proof.V)
        tr.append_point(b"A", proof.A)
        tr.append_point(b"S", proof.S)
        y = tr.challenge(DOMAIN_Y)
        z = tr.challenge(DOMAIN_Z)
        tr.append_point(b"T1", proof.T1)
        tr.append_point(b"T2", proof.T2)
        x = tr.challenge(DOMAIN_X)
        tr.append_scalar(b"taux", proof.taux)
        tr.append_scalar(b"mu", proof.mu)
        tr.append_scalar(b"t", proof.t_hat)
        w = tr.challenge(DOMAIN_Q)
        us = ipa.challenges_from_transcript(proof.ip, tr)
        s, s_inv = ipa.fold_scalars(us, n)
        a, b = proof.ip.a % S.ELL, proof.ip.b % S.ELL
        z2 = z * z % S.ELL
        x2 = x * x % S.ELL
        delta = compute_delta(y, z, n)
        t_hat = proof.t_hat % S.ELL
        y_inv = S.sc_inv(y)
        y_inv_pows = S.vec_powers(y_inv, n)
        two_n = S.vec_powers(2, n)

        r1 = secrets.randbelow(S.ELL - 1) + 1    # weight for check 1
        r2 = secrets.randbelow(S.ELL - 1) + 1    # weight for check 2

        # check 1 contributions (V=base+0, A=+1, S=+2, T1=+3, T2=+4)
        g_single = (g_single + r1 * ((t_hat - delta) % S.ELL)) % S.ELL
        h_single = (h_single + r1 * proof.taux) % S.ELL
        extra_idx.extend([base + 0, base + 3, base + 4])
        extra_sc.extend([(S.ELL - r1 * z2 % S.ELL) % S.ELL,
                         (S.ELL - r1 * x % S.ELL) % S.ELL,
                         (S.ELL - r1 * x2 % S.ELL) % S.ELL])

        # check 2 contributions
        for i in range(n):
            g_acc[i] = (g_acc[i] + r2 * ((a * s[i] + z) % S.ELL)) % S.ELL
            coeff = (b * s_inv[i] % S.ELL * y_inv_pows[i]
                     - z - z2 * two_n[i] % S.ELL * y_inv_pows[i]) % S.ELL
            h_acc[i] = (h_acc[i] + r2 * coeff) % S.ELL
        g_single = (g_single + r2 * ((a * b - t_hat) % S.ELL * w % S.ELL)) % S.ELL
        h_single = (h_single + r2 * proof.mu) % S.ELL
        extra_idx.extend([base + 1, base + 2])
        extra_sc.extend([(S.ELL - r2) % S.ELL, (S.ELL - r2 * x % S.ELL) % S.ELL])
        for j, u in enumerate(us):
            extra_idx.append(base + 5 + j)
            extra_sc.append((S.ELL - r2 * (u * u % S.ELL) % S.ELL) % S.ELL)
            extra_idx.append(base + 5 + k + j)
            extra_sc.append((S.ELL - r2 * pow(S.sc_inv(u), 2, S.ELL) % S.ELL) % S.ELL)

    # ONE gather assembles every per-proof point in MSM base order
    idx = jnp.asarray(extra_idx)
    stacked = C.GE(*(c[idx] for c in all_pts))
    bases = M.concat_ge(G, H, gens.g, gens.h, stacked)
    sc = g_acc + h_acc + [g_single, h_single] + extra_sc
    res = _final_msm(bases, sc, mesh)
    return bool(C.is_identity(C.mul8(res)))       # cofactored check
