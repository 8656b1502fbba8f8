"""Bulletproof range proofs: prover and (sound, exact) verifier.

Protocol parity with the reference (bulletproof_range_proof.cu:1159-1812):
same commitment structure {V, A, S, T1, T2, taux, mu, t, ip_proof}
(bulletproof_range_proof.h:9-19), same challenge domains
(bulletproof_challenge.cu:24-77), same prover step order (bit decomposition ->
A,S -> y,z -> t0/t1/t2 -> T1,T2 -> x -> t,taux,mu -> l(x),r(x) -> IPA).

Where we deliberately diverge (SURVEY.md §8: match intent, not defects):
  * scalar algebra is mod l (group order), not mod p — this is what makes the
    polynomial identity hold exactly in the exponent;
  * no degenerate-IPA fallback (the reference replaces l,r with [t,0..],[1,0..]
    when its own mod-p math breaks, cu:1632-1650 + fix_inner_product_proof
    cu:198-235) — our <l(x), r(x)> equals t-hat by construction;
  * verification is *exact*: three checks (polynomial identity, merged
    P/IPA multiexp, curve membership of all proof points), all via exact
    point equality, replacing robust_polynomial_identity_check's four fuzzy
    methods (cu:412-655) and enhanced_range_check's heuristics (cu:765-875);
  * out-of-range values are rejected cryptographically by the verifier, not
    just refused by the prover (the reference's negative test passes only
    because the prover emits an empty proof, cu:1176-1188).

Every group operation (commitments, the verification multiexp) is a device
MSM (ops/msm.py); Fiat-Shamir and mod-l vector algebra run on host.
"""
from __future__ import annotations

import functools
import secrets
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import curve as C, field as F, msm as M
from ..utils import debug, scalars as S
from . import ipa
from .generators import Generators, get_generators
from .transcript import Transcript

# Challenge domains: bulletproof_challenge.cu:24-77
DOMAIN_Y = b"BulletproofYChal"
DOMAIN_Z = b"BulletproofZChal"
DOMAIN_X = b"BulletproofXChal"
DOMAIN_Q = b"BulletproofQChal"   # new: binds the IPA Q-generator challenge


@dataclass
class RangeProof:
    """Reference parity: RangeProof struct (bulletproof_range_proof.h:9-19)."""
    n: int               # range bit-length
    V: bytes             # value commitment (compressed)
    A: bytes
    S: bytes
    T1: bytes
    T2: bytes
    taux: int
    mu: int
    t_hat: int
    ip: ipa.InnerProductProof


class ProveError(ValueError):
    pass


def validate_range_input(value: int, n: int) -> bool:
    """Reference parity: validate_range_input (bulletproof_range_proof.cu:238-263)."""
    return 0 <= value < (1 << n)


def pedersen_commit(value: int, blinding: int, gens: Generators) -> C.GE:
    """V = value*g + blinding*h. Reference: pedersen_commit
    (bulletproof_range_proof.cu:277-296)."""
    return M.msm_ints(M.concat_ge(gens.g, gens.h), [value % S.ELL, blinding % S.ELL])


def compute_delta(y: int, z: int, n: int) -> int:
    """delta(y,z) = (z - z^2)<1, y^n> - z^3 <1, 2^n>  (mod l).
    Reference: compute_precise_delta (bulletproof_range_proof.cu:315-409)."""
    sum_y = 0
    acc = 1
    for _ in range(n):
        sum_y += acc
        acc = acc * y % S.ELL
    sum_2 = (1 << n) - 1
    z2 = z * z % S.ELL
    z3 = z2 * z % S.ELL
    return ((z - z2) * sum_y - z3 * sum_2) % S.ELL


def _compress(p: C.GE) -> bytes:
    return bytes(np.asarray(C.to_bytes(p)).tolist())


def _base_transcript(n: int) -> Transcript:
    t = Transcript(b"tpu-bulletproofs/range")
    t.append(b"n", n.to_bytes(4, "little"))
    return t


def prove(value: int, blinding: int, n: int,
          gens: Generators | None = None) -> RangeProof:
    """Generate a range proof that `value` lies in [0, 2^n).

    Reference parity: generate_range_proof (bulletproof_range_proof.cu:1159-1714).
    """
    from .. import config
    config.require_exact()
    if not validate_range_input(value, n):
        # parity: the reference prover refuses out-of-range values (cu:1176-1188)
        raise ProveError(f"value out of range [0, 2^{n})")
    if n & (n - 1) != 0:
        raise ProveError("n must be a power of two")
    gens = gens or get_generators(n)
    assert gens.n >= n
    G = C.GE(*(c[:n] for c in gens.G))
    H = C.GE(*(c[:n] for c in gens.H))

    tr = _base_transcript(n)
    debug.banner("PROOF GENERATION STEPS")   # cu:1169 banner parity

    # V = g^v h^gamma  (cu:1194) — fused MSM+compression, one device trip
    V, = M.msm_ints_multi(M.concat_ge(gens.g, gens.h),
                          [[value % S.ELL, blinding % S.ELL]])
    debug.trace_point("V", V)

    # bit decomposition: aL[i] = bit i of value; aR = aL - 1  (cu:1197-1240)
    aL = [(value >> i) & 1 for i in range(n)]
    aR = [(x - 1) % S.ELL for x in aL]
    sL = [S.sc_random() for _ in range(n)]
    sR = [S.sc_random() for _ in range(n)]
    alpha, rho = S.sc_random(), S.sc_random()

    # A = h^alpha G^aL H^aR ; S = h^rho G^sL H^sR  (cu:1267-1289) — one trip
    A, S_b = M.msm_ints_multi(M.concat_ge(gens.h, G, H),
                              [[alpha] + aL + aR, [rho] + sL + sR])

    tr.append_point(b"V", V)
    tr.append_point(b"A", A)
    tr.append_point(b"S", S_b)
    y = tr.challenge(DOMAIN_Y)          # cu:1299 / bulletproof_challenge.cu:24-44
    z = tr.challenge(DOMAIN_Z)          # cu:1311 / bulletproof_challenge.cu:47-58
    debug.trace_point("A", A)
    debug.trace_point("S", S_b)
    debug.trace_scalar("y", y)
    debug.trace_scalar("z", z)

    y_n = S.vec_powers(y, n)
    two_n = S.vec_powers(2, n)
    z2 = z * z % S.ELL

    # l(X) = (aL - z 1) + sL X ; r(X) = y^n o (aR + z 1 + sR X) + z^2 2^n
    l0 = [(x - z) % S.ELL for x in aL]
    l1 = sL
    r0 = [(yi * ((x + z) % S.ELL) + z2 * ti) % S.ELL
          for yi, x, ti in zip(y_n, aR, two_n)]
    r1 = [(yi * si) % S.ELL for yi, si in zip(y_n, sR)]

    # t(X) = t0 + t1 X + t2 X^2  (cu:1348-1432)
    t0 = S.vec_inner(l0, r0)
    t2 = S.vec_inner(l1, r1)
    t1 = (S.vec_inner(S.vec_add(l0, l1), S.vec_add(r0, r1)) - t0 - t2) % S.ELL

    tau1, tau2 = S.sc_random(), S.sc_random()
    # T1, T2 Pedersen commitments (cu:1434-1452) — one fused device trip
    T1, T2 = M.msm_ints_multi(M.concat_ge(gens.g, gens.h),
                              [[t1, tau1 % S.ELL], [t2, tau2 % S.ELL]])

    tr.append_point(b"T1", T1)
    tr.append_point(b"T2", T2)
    x = tr.challenge(DOMAIN_X)          # cu:1454-1473
    debug.trace_scalar("x", x)

    # t, taux, mu  (cu:1475-1511)
    l_vec = [(a + b * x) % S.ELL for a, b in zip(l0, l1)]
    r_vec = [(a + b * x) % S.ELL for a, b in zip(r0, r1)]
    t_hat = S.vec_inner(l_vec, r_vec)
    x2 = x * x % S.ELL
    taux = (tau2 * x2 + tau1 * x + z2 * blinding) % S.ELL
    mu = (alpha + rho * x) % S.ELL

    tr.append_scalar(b"taux", taux)
    tr.append_scalar(b"mu", mu)
    tr.append_scalar(b"t", t_hat)
    w = tr.challenge(DOMAIN_Q)
    debug.trace_scalar("t_hat", t_hat)
    debug.trace_scalar("taux", taux)
    debug.trace_scalar("mu", mu)

    # IPA over (G, H') with H'_i = y^{-i} H_i and Q = w*g, both kept implicit
    # as host-side weights (cu:1662-1690 materializes H'; we never do)
    y_inv = S.sc_inv(y)
    y_inv_pows = S.vec_powers(y_inv, n)
    ip = ipa.prove(G, H, gens.g, l_vec, r_vec, tr,
                   q_weight=w, h_weights=y_inv_pows)

    return RangeProof(n=n, V=V, A=A, S=S_b, T1=T1, T2=T2,
                      taux=taux, mu=mu, t_hat=t_hat, ip=ip)


def _decompress_all(blobs):
    """Batch-decompress PROOF points, padded to a power of two (>=8) with a
    known-valid encoding so C.from_bytes compiles for a fixed set of shapes.
    Small-order points are rejected (torsion-safe: see C.is_small_order)."""
    n = len(blobs)
    m = 8
    while m < n:
        m *= 2
    from ..utils import oracle
    pad = oracle.BASE.compress()
    arr = jnp.asarray(np.stack(
        [np.frombuffer(b, dtype=np.uint8) for b in blobs]
        + [np.frombuffer(pad, dtype=np.uint8)] * (m - n)))
    pts, ok = C.from_bytes(arr)
    ok = jnp.logical_and(ok, ~C.is_small_order(pts))
    pts = C.GE(*(c[:n] for c in pts))
    return pts, bool(jnp.all(ok[:n]))


@functools.lru_cache(maxsize=None)
def _fused_verify_fn(n: int):
    """One-dispatch verifier core for proofs of `n` bits: decompress all proof
    points, run ONE merged MSM, check identity — a single jit call, so the
    whole verification costs one host->device round trip.

    Base order: [G(n), H(n), g, h, V, A, S, T1, T2, L(k), R(k)] with scalars
    rho1*(check-1 coefficients) + rho2*(check-2 coefficients) merged on host.
    """
    k = n.bit_length() - 1
    npts = 5 + 2 * k

    @jax.jit
    def fn(pts_bytes, scalars, G, H, g, h):
        pts, valid = C.from_bytes(pts_bytes)          # [npts]
        valid = jnp.logical_and(valid, ~C.is_small_order(pts))
        singles = C.GE(*(jnp.stack([gc, hc, c[0], c[1], c[2], c[3], c[4]])
                         for gc, hc, c in zip(g, h, pts)))
        lr = C.GE(*(c[5:] for c in pts))
        bases = C.GE(*(jnp.concatenate([gc, hc, sc, lc], axis=0)
                       for gc, hc, sc, lc in zip(G, H, singles, lr)))
        m = bases.x.shape[0]
        pad = 1
        while pad < m:
            pad *= 2
        if pad != m:
            idn = C.identity((pad - m,))
            bases = C.GE(*(jnp.concatenate([bc, ic], axis=0)
                           for bc, ic in zip(bases, idn)))
            scalars = jnp.concatenate(
                [scalars, jnp.zeros((pad - m, F.L), F.DTYPE)], axis=0)
        # cofactored check: x8 clears any torsion component so acceptance is
        # decided purely in the prime-order subgroup
        res = C.mul8(M.msm_auto(bases, scalars))
        return jnp.logical_and(jnp.all(valid), C.is_identity(res))

    return fn


def verify(proof: RangeProof, gens: Generators | None = None) -> bool:
    """Fused verification: both checks of verify_deterministic merged into one
    MSM via a random linear combination (soundness error 1/l, standard
    batching) and executed in a single device dispatch."""
    from .. import config
    config.require_exact()
    n = proof.n
    if n < 1 or n & (n - 1) != 0 or proof.ip.n != n:
        return False
    if len(proof.ip.L) != len(proof.ip.R) or (1 << len(proof.ip.L)) != n:
        return False
    if any(len(b) != 32 for b in
           [proof.V, proof.A, proof.S, proof.T1, proof.T2, *proof.ip.L,
            *proof.ip.R]):
        return False
    gens = gens or get_generators(n)
    if gens.n < n:
        return False
    G = C.GE(*(c[:n] for c in gens.G))
    H = C.GE(*(c[:n] for c in gens.H))

    tr = _base_transcript(n)
    debug.banner("PROOF VERIFICATION (fused)")
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
    debug.trace_scalar("y", y)
    debug.trace_scalar("z", z)
    debug.trace_scalar("x", x)
    us = ipa.challenges_from_transcript(proof.ip, tr)
    s, s_inv = ipa.fold_scalars(us, n)

    z2 = z * z % S.ELL
    x2 = x * x % S.ELL
    delta = compute_delta(y, z, n)
    t_hat = proof.t_hat % S.ELL
    a, b = proof.ip.a % S.ELL, proof.ip.b % S.ELL
    y_inv = S.sc_inv(y)
    y_inv_pows = S.vec_powers(y_inv, n)
    two_n = S.vec_powers(2, n)

    r1 = secrets.randbelow(S.ELL - 1) + 1
    r2 = secrets.randbelow(S.ELL - 1) + 1

    g_sc = [r2 * ((a * si + z) % S.ELL) % S.ELL for si in s]
    h_sc = [r2 * ((b * sii % S.ELL * yi - z - z2 * ti % S.ELL * yi) % S.ELL) % S.ELL
            for sii, yi, ti in zip(s_inv, y_inv_pows, two_n)]
    sc_g = (r1 * ((t_hat - delta) % S.ELL) + r2 * ((a * b - t_hat) % S.ELL * w)) % S.ELL
    sc_h = (r1 * proof.taux + r2 * proof.mu) % S.ELL
    sc_v = (S.ELL - r1 * z2 % S.ELL) % S.ELL
    sc_a = (S.ELL - r2) % S.ELL
    sc_s = (S.ELL - r2 * x % S.ELL) % S.ELL
    sc_t1 = (S.ELL - r1 * x % S.ELL) % S.ELL
    sc_t2 = (S.ELL - r1 * x2 % S.ELL) % S.ELL
    l_sc = [(S.ELL - r2 * (u * u % S.ELL) % S.ELL) % S.ELL for u in us]
    r_sc = [(S.ELL - r2 * pow(S.sc_inv(u), 2, S.ELL) % S.ELL) % S.ELL for u in us]

    scalars = F.from_ints(
        g_sc + h_sc + [sc_g, sc_h, sc_v, sc_a, sc_s, sc_t1, sc_t2] + l_sc + r_sc)
    blobs = [proof.V, proof.A, proof.S, proof.T1, proof.T2] + \
        list(proof.ip.L) + list(proof.ip.R)
    pts_bytes = jnp.asarray(np.stack(
        [np.frombuffer(x_, dtype=np.uint8) for x_ in blobs]))
    fn = _fused_verify_fn(n)
    return bool(fn(pts_bytes, scalars, G, H, gens.g, gens.h))


def prove_fast(value: int, blinding: int, n: int,
               gens: Generators | None = None) -> RangeProof:
    """Latency-optimized proving entry point (mirror of verify_fast).

    A single small proof is a handful of ~100-point MSMs interleaved with
    host Fiat-Shamir hashing — a dozen host<->device round trips whose sync
    latency dwarfs the compute.  The native C++ path (identical wire format,
    transcript and generators; cross-verified in tests/test_native.py) proves
    it in ~2 ms; the TPU path serves large aggregated proofs where the MSMs
    are big enough to pay for the trips."""
    from ..utils import native, serialization
    from .. import config
    # all Generators instances use the single deterministic derivation the
    # native library reproduces, so routing never changes the statement
    if n <= config.NATIVE_VERIFY_MAX_BITS and native.available():
        if not validate_range_input(value, n):
            raise ProveError(f"value out of range [0, 2^{n})")
        blob = native.prove_range(value, blinding % S.ELL, n)
        if blob:
            return serialization.deserialize_range_proof(blob)
    return prove(value, blinding, n, gens)


def verify_fast(proof: RangeProof, gens: Generators | None = None) -> bool:
    """Latency-optimized verification entry point.

    A single small proof (n <= 64) is host-scale work: ~17k curve adds fit in
    ~1 ms of native CPU; shipping them to an accelerator is pure overhead (the
    reference's own recorded numbers show this — its GPU verify beats its CPU
    verify by only 1.10x, BASELINE.md).  The TPU paths win where the MSMs are
    large: aggregated proofs, batch verification, 2^16+-point MSMs.  This
    router sends small single proofs to the native C++ path (identical wire
    format and transcript) and everything else to the fused TPU verifier."""
    from ..utils import native, serialization
    if proof.n <= 64 and native.available():
        # all Generators instances use the single deterministic derivation,
        # which the native library reproduces (tests/test_native.py)
        return native.verify_range(serialization.serialize_range_proof(proof))
    return verify(proof, gens)


def verify_deterministic(proof: RangeProof, gens: Generators | None = None) -> bool:
    """Verify a range proof with exact algebra.  Reference parity:
    range_proof_verify (bulletproof_range_proof.cu:1717-1812), with the fuzzy
    acceptance paths replaced by exact checks.

    Check 1 (polynomial identity, replaces robust_polynomial_identity_check
    cu:412-655):   (t_hat - delta)g + taux*h - z^2 V - x T1 - x^2 T2 == 0
    Check 2 (merged P-reconstruction + one-shot IPA, replaces
    calculate_inner_product_point cu:658-763 + inner_product_verify):
       sum (a s_i + z) G_i
     + sum (b s_i^{-1} y^{-i} - z - z^2 2^i y^{-i}) H_i
     + (ab - t_hat) w g + mu h - A - x S - sum(u_j^2 L_j + u_j^{-2} R_j) == 0
    """
    from .. import config
    config.require_exact()
    n = proof.n
    if n < 1 or n & (n - 1) != 0 or proof.ip.n != n:
        return False
    if len(proof.ip.L) != len(proof.ip.R) or (1 << len(proof.ip.L)) != n:
        return False
    if any(len(b) != 32 for b in
           [proof.V, proof.A, proof.S, proof.T1, proof.T2, *proof.ip.L,
            *proof.ip.R]):
        return False
    gens = gens or get_generators(n)
    if gens.n < n:
        return False
    G = C.GE(*(c[:n] for c in gens.G))
    H = C.GE(*(c[:n] for c in gens.H))

    # decompress & validate every proof point (on-curve by construction of
    # the decompression equation; also rejects non-canonical encodings)
    pts, ok = _decompress_all([proof.V, proof.A, proof.S, proof.T1, proof.T2])
    if not ok:
        return False
    V_pt = C.GE(*(c[0] for c in pts))
    A_pt = C.GE(*(c[1] for c in pts))
    S_pt = C.GE(*(c[2] for c in pts))
    T1_pt = C.GE(*(c[3] for c in pts))
    T2_pt = C.GE(*(c[4] for c in pts))

    tr = _base_transcript(n)
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

    z2 = z * z % S.ELL
    x2 = x * x % S.ELL
    delta = compute_delta(y, z, n)
    t_hat = proof.t_hat % S.ELL

    # --- check 1: polynomial identity (exact) ---
    sc1 = [(t_hat - delta) % S.ELL, proof.taux % S.ELL,
           (S.ELL - z2) % S.ELL, (S.ELL - x) % S.ELL, (S.ELL - x2) % S.ELL]
    res1 = M.msm_ints(M.concat_ge(gens.g, gens.h, V_pt, T1_pt, T2_pt), sc1)
    if not bool(C.is_identity(C.mul8(res1))):     # cofactored check
        return False

    # --- check 2: merged P + one-shot IPA multiexp (exact) ---
    us = ipa.challenges_from_transcript(proof.ip, tr)
    s, s_inv = ipa.fold_scalars(us, n)
    a, b = proof.ip.a % S.ELL, proof.ip.b % S.ELL
    # note: a*b == t_hat is enforced by the (ab - t_hat)w g term of the multiexp
    y_inv = S.sc_inv(y)
    y_inv_pows = S.vec_powers(y_inv, n)
    two_n = S.vec_powers(2, n)

    g_sc = [(a * si + z) % S.ELL for si in s]
    h_sc = [(b * sii % S.ELL * yi - z - z2 * ti % S.ELL * yi) % S.ELL
            for sii, yi, ti in zip(s_inv, y_inv_pows, two_n)]
    gq_sc = (a * b - t_hat) % S.ELL * w % S.ELL
    h_single = proof.mu % S.ELL
    a_sc = S.ELL - 1
    s_sc = (S.ELL - x) % S.ELL
    l_sc = [(S.ELL - u * u % S.ELL) % S.ELL for u in us]
    r_sc = [(S.ELL - pow(S.sc_inv(u), 2, S.ELL)) % S.ELL for u in us]

    if proof.ip.L:
        L_pts, okl = _decompress_all(proof.ip.L)
        R_pts, okr = _decompress_all(proof.ip.R)
        if not (okl and okr):
            return False
        bases = M.concat_ge(G, H, gens.g, gens.h, A_pt, S_pt, L_pts, R_pts)
        sc2 = g_sc + h_sc + [gq_sc, h_single, a_sc, s_sc] + l_sc + r_sc
    else:
        bases = M.concat_ge(G, H, gens.g, gens.h, A_pt, S_pt)
        sc2 = g_sc + h_sc + [gq_sc, h_single, a_sc, s_sc]
    res2 = M.msm_ints(bases, sc2)
    return bool(C.is_identity(C.mul8(res2)))      # cofactored check
