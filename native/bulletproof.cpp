#include "bulletproof.h"

#include <array>
#include <cstdio>
#include <fstream>

namespace bp {

// --- helpers -----------------------------------------------------------------
static ge ge_scalarmult_sc(const ge& p, const sc& s) {
    uint8_t b[32];
    sc_to_bytes(b, s);
    return ge_scalarmult(p, b);
}

// Straus windowed multiexp, w=4: per-point 16-entry tables, 64 windows of
// (4 doublings + one add per nonzero digit).  ~5-6x fewer point ops than
// per-point double-and-add ladders for protocol-sized inputs.
static ge msm(const std::vector<const ge*>& pts, const std::vector<sc>& scs) {
    const size_t n = pts.size();
    std::vector<ge> table(n * 16);
    std::vector<uint8_t> sbytes(n * 32);
    for (size_t i = 0; i < n; i++) {
        table[i * 16] = ge_identity();
        for (int d = 1; d < 16; d++)
            table[i * 16 + d] = ge_add(table[i * 16 + d - 1], *pts[i]);
        sc_to_bytes(&sbytes[i * 32], scs[i]);
    }
    ge acc = ge_identity();
    for (int wnd = 63; wnd >= 0; wnd--) {
        for (int k = 0; k < 4; k++) acc = ge_double(acc);
        for (size_t i = 0; i < n; i++) {
            const uint8_t byte = sbytes[i * 32 + (wnd >> 1)];
            const int digit = (wnd & 1) ? (byte >> 4) : (byte & 0x0F);
            if (digit) acc = ge_add(acc, table[i * 16 + digit]);
        }
    }
    return acc;
}

sc sc_random() {
    uint8_t buf[64];
    std::ifstream f("/dev/urandom", std::ios::binary);
    f.read(reinterpret_cast<char*>(buf), 64);
    return sc_from_bytes_wide(buf);
}

// --- generators --------------------------------------------------------------
ge hash_to_point(const char* label, uint64_t index) {
    for (uint64_t ctr = 0;; ctr++) {
        Sha256 h;
        h.update("tpu-bulletproofs/gen", 20);
        h.update(label, strlen(label));
        uint8_t idx[8], c[8];
        for (int i = 0; i < 8; i++) {
            idx[i] = uint8_t(index >> (8 * i));
            c[i] = uint8_t(ctr >> (8 * i));
        }
        h.update(idx, 8);
        h.update(c, 8);
        uint8_t cand[32];
        h.final(cand);
        ge pt;
        if (!ge_frombytes(pt, cand)) continue;
        ge pt8 = ge_double(ge_double(ge_double(pt)));   // clear cofactor
        if (ge_is_identity(pt8)) continue;
        return pt8;
    }
}

Generators make_generators(uint32_t n) {
    Generators g;
    g.n = n;
    g.g = hash_to_point("/g", 0);
    g.h = hash_to_point("/h", 0);
    g.G.reserve(n);
    g.H.reserve(n);
    for (uint32_t i = 0; i < n; i++) g.G.push_back(hash_to_point("/G", i));
    for (uint32_t i = 0; i < n; i++) g.H.push_back(hash_to_point("/H", i));
    return g;
}

// --- scalar vector helpers ---------------------------------------------------
static sc vec_inner(const std::vector<sc>& a, const std::vector<sc>& b) {
    sc acc = sc_zero();
    for (size_t i = 0; i < a.size(); i++) acc = sc_add(acc, sc_mul(a[i], b[i]));
    return acc;
}

static sc sc_from_u64(uint64_t x) {
    sc r = sc_zero();
    r.v[0] = x;
    return r;
}

// --- IPA ---------------------------------------------------------------------
static const char* IPA_DOMAIN = "InnerProductChal";

static InnerProductProof ipa_prove(std::vector<ge> G, std::vector<ge> H,
                                   const ge& Qbase, const sc& q_weight,
                                   std::vector<sc> a, std::vector<sc> b,
                                   Transcript& tr) {
    InnerProductProof out;
    uint32_t n = (uint32_t)a.size();
    out.n = n;
    while (n > 1) {
        uint32_t h = n / 2;
        std::vector<sc> aL(a.begin(), a.begin() + h), aR(a.begin() + h, a.end());
        std::vector<sc> bL(b.begin(), b.begin() + h), bR(b.begin() + h, b.end());
        sc cL = vec_inner(aL, bR), cR = vec_inner(aR, bL);
        std::vector<const ge*> lp, rp;
        std::vector<sc> ls, rs;
        for (uint32_t i = 0; i < h; i++) { lp.push_back(&G[h + i]); ls.push_back(aL[i]); }
        for (uint32_t i = 0; i < h; i++) { lp.push_back(&H[i]); ls.push_back(bR[i]); }
        lp.push_back(&Qbase); ls.push_back(sc_mul(cL, q_weight));
        for (uint32_t i = 0; i < h; i++) { rp.push_back(&G[i]); rs.push_back(aR[i]); }
        for (uint32_t i = 0; i < h; i++) { rp.push_back(&H[h + i]); rs.push_back(bL[i]); }
        rp.push_back(&Qbase); rs.push_back(sc_mul(cR, q_weight));
        ge Lp = msm(lp, ls), Rp = msm(rp, rs);
        std::array<uint8_t, 32> Lb, Rb;
        ge_tobytes(Lb.data(), Lp);
        ge_tobytes(Rb.data(), Rp);
        tr.append_point("ipL", Lb.data());
        tr.append_point("ipR", Rb.data());
        sc u = tr.challenge(IPA_DOMAIN);
        sc ui = sc_inv(u);
        out.L.push_back(Lb);
        out.R.push_back(Rb);
        std::vector<sc> a2(h), b2(h);
        std::vector<ge> G2(h), H2(h);
        for (uint32_t i = 0; i < h; i++) {
            a2[i] = sc_add(sc_mul(u, aL[i]), sc_mul(ui, aR[i]));
            b2[i] = sc_add(sc_mul(ui, bL[i]), sc_mul(u, bR[i]));
            G2[i] = ge_add(ge_scalarmult_sc(G[i], ui), ge_scalarmult_sc(G[h + i], u));
            H2[i] = ge_add(ge_scalarmult_sc(H[i], u), ge_scalarmult_sc(H[h + i], ui));
        }
        a = std::move(a2); b = std::move(b2);
        G = std::move(G2); H = std::move(H2);
        n = h;
    }
    out.a = a[0];
    out.b = b[0];
    return out;
}

// --- range proof -------------------------------------------------------------
static const char* DOMAIN_Y = "BulletproofYChal";
static const char* DOMAIN_Z = "BulletproofZChal";
static const char* DOMAIN_X = "BulletproofXChal";
static const char* DOMAIN_Q = "BulletproofQChal";

static Transcript base_transcript(uint32_t n) {
    Transcript tr("tpu-bulletproofs/range");
    tr.append_u32("n", n);
    return tr;
}

static sc compute_delta(const sc& y, const sc& z, uint32_t n) {
    sc sum_y = sc_zero(), acc = sc_one();
    for (uint32_t i = 0; i < n; i++) {
        sum_y = sc_add(sum_y, acc);
        acc = sc_mul(acc, y);
    }
    sc sum_2 = sc_zero(), p2 = sc_one();
    for (uint32_t i = 0; i < n; i++) {
        sum_2 = sc_add(sum_2, p2);
        p2 = sc_add(p2, p2);
    }
    sc z2 = sc_mul(z, z);
    sc z3 = sc_mul(z2, z);
    return sc_sub(sc_mul(sc_sub(z, z2), sum_y), sc_mul(z3, sum_2));
}

bool prove_range(RangeProof& out, uint64_t value, const sc& gamma, uint32_t nbits,
                 const Generators& gens) {
    if (nbits == 0 || nbits > 64 || (nbits & (nbits - 1)) != 0) return false;
    if (nbits < 64 && (value >> nbits) != 0) return false;   // prover-side range check
    if (gens.n < nbits) return false;
    uint32_t n = nbits;
    out.n = n;
    Transcript tr = base_transcript(n);

    // V = v*g + gamma*h
    sc v_sc = sc_from_u64(value);
    ge V = ge_add(ge_scalarmult_sc(gens.g, v_sc), ge_scalarmult_sc(gens.h, gamma));
    ge_tobytes(out.V, V);

    std::vector<sc> aL(n), aR(n), sL(n), sR(n);
    for (uint32_t i = 0; i < n; i++) {
        aL[i] = sc_from_u64((value >> i) & 1);
        aR[i] = sc_sub(aL[i], sc_one());
        sL[i] = sc_random();
        sR[i] = sc_random();
    }
    sc alpha = sc_random(), rho = sc_random();
    {
        std::vector<const ge*> pts{&gens.h};
        std::vector<sc> scs{alpha};
        for (uint32_t i = 0; i < n; i++) { pts.push_back(&gens.G[i]); scs.push_back(aL[i]); }
        for (uint32_t i = 0; i < n; i++) { pts.push_back(&gens.H[i]); scs.push_back(aR[i]); }
        ge_tobytes(out.A, msm(pts, scs));
        scs[0] = rho;
        for (uint32_t i = 0; i < n; i++) scs[1 + i] = sL[i];
        for (uint32_t i = 0; i < n; i++) scs[1 + n + i] = sR[i];
        ge_tobytes(out.S, msm(pts, scs));
    }
    tr.append_point("V", out.V);
    tr.append_point("A", out.A);
    tr.append_point("S", out.S);
    sc y = tr.challenge(DOMAIN_Y);
    sc z = tr.challenge(DOMAIN_Z);
    sc z2 = sc_mul(z, z);

    std::vector<sc> y_n(n), two_n(n);
    {
        sc acc = sc_one(), p2 = sc_one();
        for (uint32_t i = 0; i < n; i++) {
            y_n[i] = acc; acc = sc_mul(acc, y);
            two_n[i] = p2; p2 = sc_add(p2, p2);
        }
    }
    std::vector<sc> l0(n), l1 = sL, r0(n), r1(n);
    for (uint32_t i = 0; i < n; i++) {
        l0[i] = sc_sub(aL[i], z);
        r0[i] = sc_add(sc_mul(y_n[i], sc_add(aR[i], z)), sc_mul(z2, two_n[i]));
        r1[i] = sc_mul(y_n[i], sR[i]);
    }
    sc t0 = vec_inner(l0, r0);
    sc t2 = vec_inner(l1, r1);
    std::vector<sc> l01(n), r01(n);
    for (uint32_t i = 0; i < n; i++) {
        l01[i] = sc_add(l0[i], l1[i]);
        r01[i] = sc_add(r0[i], r1[i]);
    }
    sc t1 = sc_sub(sc_sub(vec_inner(l01, r01), t0), t2);

    sc tau1 = sc_random(), tau2 = sc_random();
    ge_tobytes(out.T1, ge_add(ge_scalarmult_sc(gens.g, t1), ge_scalarmult_sc(gens.h, tau1)));
    ge_tobytes(out.T2, ge_add(ge_scalarmult_sc(gens.g, t2), ge_scalarmult_sc(gens.h, tau2)));
    tr.append_point("T1", out.T1);
    tr.append_point("T2", out.T2);
    sc x = tr.challenge(DOMAIN_X);
    sc x2 = sc_mul(x, x);

    std::vector<sc> l_vec(n), r_vec(n);
    for (uint32_t i = 0; i < n; i++) {
        l_vec[i] = sc_add(l0[i], sc_mul(l1[i], x));
        r_vec[i] = sc_add(r0[i], sc_mul(r1[i], x));
    }
    out.t_hat = vec_inner(l_vec, r_vec);
    out.taux = sc_add(sc_add(sc_mul(tau2, x2), sc_mul(tau1, x)), sc_mul(z2, gamma));
    out.mu = sc_add(alpha, sc_mul(rho, x));

    tr.append_scalar("taux", out.taux);
    tr.append_scalar("mu", out.mu);
    tr.append_scalar("t", out.t_hat);
    sc w = tr.challenge(DOMAIN_Q);

    // H' = y^-i H_i
    sc yi = sc_inv(y);
    std::vector<ge> Hp(n);
    {
        sc acc = sc_one();
        for (uint32_t i = 0; i < n; i++) {
            Hp[i] = ge_scalarmult_sc(gens.H[i], acc);
            acc = sc_mul(acc, yi);
        }
    }
    std::vector<ge> Gv(gens.G.begin(), gens.G.begin() + n);
    out.ip = ipa_prove(Gv, Hp, gens.g, w, l_vec, r_vec, tr);
    return true;
}

bool verify_range(const RangeProof& proof, const Generators& gens) {
    uint32_t n = proof.n;
    if (n == 0 || (n & (n - 1)) != 0 || gens.n < n) return false;
    uint32_t k = 0;
    while ((1u << k) < n) k++;
    if (proof.ip.L.size() != k || proof.ip.R.size() != k || proof.ip.n != n) return false;

    ge V, A, S, T1, T2;
    if (!ge_frombytes(V, proof.V) || !ge_frombytes(A, proof.A) ||
        !ge_frombytes(S, proof.S) || !ge_frombytes(T1, proof.T1) ||
        !ge_frombytes(T2, proof.T2))
        return false;
    if (ge_is_small_order(V) || ge_is_small_order(A) || ge_is_small_order(S) ||
        ge_is_small_order(T1) || ge_is_small_order(T2))
        return false;   // torsion-safe: reject E[8] proof points

    Transcript tr = base_transcript(n);
    tr.append_point("V", proof.V);
    tr.append_point("A", proof.A);
    tr.append_point("S", proof.S);
    sc y = tr.challenge(DOMAIN_Y);
    sc z = tr.challenge(DOMAIN_Z);
    tr.append_point("T1", proof.T1);
    tr.append_point("T2", proof.T2);
    sc x = tr.challenge(DOMAIN_X);
    tr.append_scalar("taux", proof.taux);
    tr.append_scalar("mu", proof.mu);
    tr.append_scalar("t", proof.t_hat);
    sc w = tr.challenge(DOMAIN_Q);

    sc z2 = sc_mul(z, z);
    sc x2 = sc_mul(x, x);
    sc delta = compute_delta(y, z, n);

    // check 1: (t_hat - delta) g + taux h - z^2 V - x T1 - x^2 T2 == identity
    {
        std::vector<const ge*> pts{&gens.g, &gens.h, &V, &T1, &T2};
        std::vector<sc> scs{sc_sub(proof.t_hat, delta), proof.taux,
                            sc_neg(z2), sc_neg(x), sc_neg(x2)};
        // cofactored check: x8 so acceptance is decided in the prime subgroup
        if (!ge_is_identity(ge_mul8(msm(pts, scs)))) return false;
    }

    // re-derive IPA challenges
    std::vector<sc> us(k), us_inv(k);
    std::vector<ge> Lp(k), Rp(k);
    for (uint32_t j = 0; j < k; j++) {
        if (!ge_frombytes(Lp[j], proof.ip.L[j].data())) return false;
        if (!ge_frombytes(Rp[j], proof.ip.R[j].data())) return false;
        if (ge_is_small_order(Lp[j]) || ge_is_small_order(Rp[j])) return false;
        tr.append_point("ipL", proof.ip.L[j].data());
        tr.append_point("ipR", proof.ip.R[j].data());
        us[j] = tr.challenge(IPA_DOMAIN);
        us_inv[j] = sc_inv(us[j]);
    }
    // fold scalars s_i
    std::vector<sc> s(n);
    for (uint32_t i = 0; i < n; i++) {
        sc acc = sc_one();
        for (uint32_t j = 0; j < k; j++) {
            uint32_t bit = (i >> (k - 1 - j)) & 1;
            acc = sc_mul(acc, bit ? us[j] : us_inv[j]);
        }
        s[i] = acc;
    }

    sc a = proof.ip.a, b = proof.ip.b;
    sc y_inv = sc_inv(y);
    std::vector<const ge*> pts;
    std::vector<sc> scs;
    {
        sc yacc = sc_one(), two = sc_one();
        for (uint32_t i = 0; i < n; i++) {
            pts.push_back(&gens.G[i]);
            scs.push_back(sc_add(sc_mul(a, s[i]), z));
            pts.push_back(&gens.H[i]);
            sc s_inv_i = s[n - 1 - i];
            sc term = sc_sub(sc_mul(sc_mul(b, s_inv_i), yacc),
                             sc_add(z, sc_mul(sc_mul(z2, two), yacc)));
            scs.push_back(term);
            yacc = sc_mul(yacc, y_inv);
            two = sc_add(two, two);
        }
    }
    pts.push_back(&gens.g);
    scs.push_back(sc_mul(sc_sub(sc_mul(a, b), proof.t_hat), w));
    pts.push_back(&gens.h);
    scs.push_back(proof.mu);
    pts.push_back(&A);
    scs.push_back(sc_neg(sc_one()));
    pts.push_back(&S);
    scs.push_back(sc_neg(x));
    for (uint32_t j = 0; j < k; j++) {
        pts.push_back(&Lp[j]);
        scs.push_back(sc_neg(sc_mul(us[j], us[j])));
        pts.push_back(&Rp[j]);
        scs.push_back(sc_neg(sc_mul(us_inv[j], us_inv[j])));
    }
    return ge_is_identity(ge_mul8(msm(pts, scs)));   // cofactored check
}

// --- aggregated proofs (models/aggregate.py parity) --------------------------
static Transcript base_transcript_agg(uint32_t n, uint32_t m) {
    Transcript tr("tpu-bulletproofs/range-agg");
    tr.append_u32("n", n);
    tr.append_u32("m", m);
    return tr;
}

static sc delta_agg(const sc& y, const sc& z, uint32_t n, uint32_t m) {
    uint32_t N = n * m;
    sc sum_y = sc_zero(), acc = sc_one();
    for (uint32_t i = 0; i < N; i++) {
        sum_y = sc_add(sum_y, acc);
        acc = sc_mul(acc, y);
    }
    sc sum_2 = sc_zero(), p2 = sc_one();
    for (uint32_t i = 0; i < n; i++) {
        sum_2 = sc_add(sum_2, p2);
        p2 = sc_add(p2, p2);
    }
    sc z2 = sc_mul(z, z);
    sc total = sc_mul(sc_sub(z, z2), sum_y);
    sc zj = sc_mul(z2, z);                        // z^3
    for (uint32_t j = 0; j < m; j++) {
        total = sc_sub(total, sc_mul(zj, sum_2));
        zj = sc_mul(zj, z);
    }
    return total;
}

bool prove_agg(AggregatedRangeProof& out, const uint64_t* values,
               const sc* gammas, uint32_t m, uint32_t nbits,
               const Generators& gens) {
    if (nbits == 0 || nbits > 64 || (nbits & (nbits - 1)) != 0) return false;
    if (m == 0 || (m & (m - 1)) != 0) return false;
    uint32_t n = nbits, N = n * m;
    if (gens.n < N) return false;
    for (uint32_t j = 0; j < m; j++)
        if (nbits < 64 && (values[j] >> nbits) != 0) return false;
    out.n = n;
    out.m = m;
    Transcript tr = base_transcript_agg(n, m);

    out.V.resize(m);
    for (uint32_t j = 0; j < m; j++) {
        ge Vj = ge_add(ge_scalarmult_sc(gens.g, sc_from_u64(values[j])),
                       ge_scalarmult_sc(gens.h, gammas[j]));
        ge_tobytes(out.V[j].data(), Vj);
        tr.append_point("V", out.V[j].data());
    }

    std::vector<sc> aL(N), aR(N), sL(N), sR(N);
    for (uint32_t i = 0; i < N; i++) {
        aL[i] = sc_from_u64((values[i / n] >> (i % n)) & 1);
        aR[i] = sc_sub(aL[i], sc_one());
        sL[i] = sc_random();
        sR[i] = sc_random();
    }
    sc alpha = sc_random(), rho = sc_random();
    {
        std::vector<const ge*> pts{&gens.h};
        std::vector<sc> scs{alpha};
        for (uint32_t i = 0; i < N; i++) { pts.push_back(&gens.G[i]); scs.push_back(aL[i]); }
        for (uint32_t i = 0; i < N; i++) { pts.push_back(&gens.H[i]); scs.push_back(aR[i]); }
        ge_tobytes(out.A, msm(pts, scs));
        scs[0] = rho;
        for (uint32_t i = 0; i < N; i++) scs[1 + i] = sL[i];
        for (uint32_t i = 0; i < N; i++) scs[1 + N + i] = sR[i];
        ge_tobytes(out.S, msm(pts, scs));
    }
    tr.append_point("A", out.A);
    tr.append_point("S", out.S);
    sc y = tr.challenge(DOMAIN_Y);
    sc z = tr.challenge(DOMAIN_Z);
    sc z2 = sc_mul(z, z);

    std::vector<sc> y_N(N), two_n(n), z_pows(m);
    {
        sc acc = sc_one();
        for (uint32_t i = 0; i < N; i++) { y_N[i] = acc; acc = sc_mul(acc, y); }
        sc p2 = sc_one();
        for (uint32_t i = 0; i < n; i++) { two_n[i] = p2; p2 = sc_add(p2, p2); }
        sc zp = sc_one();
        for (uint32_t j = 0; j < m; j++) { z_pows[j] = zp; zp = sc_mul(zp, z); }
    }
    std::vector<sc> l0(N), l1 = sL, r0(N), r1(N);
    for (uint32_t i = 0; i < N; i++) {
        l0[i] = sc_sub(aL[i], z);
        sc zz = sc_mul(z2, z_pows[i / n]);
        r0[i] = sc_add(sc_mul(y_N[i], sc_add(aR[i], z)), sc_mul(zz, two_n[i % n]));
        r1[i] = sc_mul(y_N[i], sR[i]);
    }
    sc t0 = vec_inner(l0, r0);
    sc t2 = vec_inner(l1, r1);
    std::vector<sc> l01(N), r01(N);
    for (uint32_t i = 0; i < N; i++) {
        l01[i] = sc_add(l0[i], l1[i]);
        r01[i] = sc_add(r0[i], r1[i]);
    }
    sc t1 = sc_sub(sc_sub(vec_inner(l01, r01), t0), t2);

    sc tau1 = sc_random(), tau2 = sc_random();
    ge_tobytes(out.T1, ge_add(ge_scalarmult_sc(gens.g, t1), ge_scalarmult_sc(gens.h, tau1)));
    ge_tobytes(out.T2, ge_add(ge_scalarmult_sc(gens.g, t2), ge_scalarmult_sc(gens.h, tau2)));
    tr.append_point("T1", out.T1);
    tr.append_point("T2", out.T2);
    sc x = tr.challenge(DOMAIN_X);
    sc x2 = sc_mul(x, x);

    std::vector<sc> l_vec(N), r_vec(N);
    for (uint32_t i = 0; i < N; i++) {
        l_vec[i] = sc_add(l0[i], sc_mul(l1[i], x));
        r_vec[i] = sc_add(r0[i], sc_mul(r1[i], x));
    }
    out.t_hat = vec_inner(l_vec, r_vec);
    out.taux = sc_add(sc_mul(tau2, x2), sc_mul(tau1, x));
    for (uint32_t j = 0; j < m; j++)
        out.taux = sc_add(out.taux, sc_mul(sc_mul(z2, z_pows[j]), gammas[j]));
    out.mu = sc_add(alpha, sc_mul(rho, x));

    tr.append_scalar("taux", out.taux);
    tr.append_scalar("mu", out.mu);
    tr.append_scalar("t", out.t_hat);
    sc w = tr.challenge(DOMAIN_Q);

    sc yi = sc_inv(y);
    std::vector<ge> Hp(N);
    {
        sc acc = sc_one();
        for (uint32_t i = 0; i < N; i++) {
            Hp[i] = ge_scalarmult_sc(gens.H[i], acc);
            acc = sc_mul(acc, yi);
        }
    }
    std::vector<ge> Gv(gens.G.begin(), gens.G.begin() + N);
    out.ip = ipa_prove(Gv, Hp, gens.g, w, l_vec, r_vec, tr);
    return true;
}

bool verify_agg(const AggregatedRangeProof& proof, const Generators& gens) {
    uint32_t n = proof.n, m = proof.m;
    if (n == 0 || (n & (n - 1)) != 0) return false;
    if (m == 0 || (m & (m - 1)) != 0) return false;
    uint32_t N = n * m;
    if (gens.n < N || proof.V.size() != m) return false;
    uint32_t k = 0;
    while ((1u << k) < N) k++;
    if (proof.ip.L.size() != k || proof.ip.R.size() != k || proof.ip.n != N) return false;

    std::vector<ge> Vp(m);
    ge A, S, T1, T2;
    for (uint32_t j = 0; j < m; j++) {
        if (!ge_frombytes(Vp[j], proof.V[j].data())) return false;
        if (ge_is_small_order(Vp[j])) return false;
    }
    if (!ge_frombytes(A, proof.A) || !ge_frombytes(S, proof.S) ||
        !ge_frombytes(T1, proof.T1) || !ge_frombytes(T2, proof.T2))
        return false;
    if (ge_is_small_order(A) || ge_is_small_order(S) ||
        ge_is_small_order(T1) || ge_is_small_order(T2))
        return false;

    Transcript tr = base_transcript_agg(n, m);
    for (uint32_t j = 0; j < m; j++)
        tr.append_point("V", proof.V[j].data());
    tr.append_point("A", proof.A);
    tr.append_point("S", proof.S);
    sc y = tr.challenge(DOMAIN_Y);
    sc z = tr.challenge(DOMAIN_Z);
    tr.append_point("T1", proof.T1);
    tr.append_point("T2", proof.T2);
    sc x = tr.challenge(DOMAIN_X);
    tr.append_scalar("taux", proof.taux);
    tr.append_scalar("mu", proof.mu);
    tr.append_scalar("t", proof.t_hat);
    sc w = tr.challenge(DOMAIN_Q);

    sc z2 = sc_mul(z, z);
    sc x2 = sc_mul(x, x);
    sc delta = delta_agg(y, z, n, m);
    std::vector<sc> z_pows(m);
    {
        sc zp = sc_one();
        for (uint32_t j = 0; j < m; j++) { z_pows[j] = zp; zp = sc_mul(zp, z); }
    }

    // check 1: (t_hat-delta) g + taux h - sum_j z^{2+j} V_j - x T1 - x^2 T2
    {
        std::vector<const ge*> pts{&gens.g, &gens.h, &T1, &T2};
        std::vector<sc> scs{sc_sub(proof.t_hat, delta), proof.taux,
                            sc_neg(x), sc_neg(x2)};
        for (uint32_t j = 0; j < m; j++) {
            pts.push_back(&Vp[j]);
            scs.push_back(sc_neg(sc_mul(z2, z_pows[j])));
        }
        if (!ge_is_identity(ge_mul8(msm(pts, scs)))) return false;
    }

    std::vector<sc> us(k), us_inv(k);
    std::vector<ge> Lp(k), Rp(k);
    for (uint32_t j = 0; j < k; j++) {
        if (!ge_frombytes(Lp[j], proof.ip.L[j].data())) return false;
        if (!ge_frombytes(Rp[j], proof.ip.R[j].data())) return false;
        if (ge_is_small_order(Lp[j]) || ge_is_small_order(Rp[j])) return false;
        tr.append_point("ipL", proof.ip.L[j].data());
        tr.append_point("ipR", proof.ip.R[j].data());
        us[j] = tr.challenge(IPA_DOMAIN);
        us_inv[j] = sc_inv(us[j]);
    }
    std::vector<sc> s(N);
    for (uint32_t i = 0; i < N; i++) {
        sc acc = sc_one();
        for (uint32_t j = 0; j < k; j++) {
            uint32_t bit = (i >> (k - 1 - j)) & 1;
            acc = sc_mul(acc, bit ? us[j] : us_inv[j]);
        }
        s[i] = acc;
    }

    sc a = proof.ip.a, b = proof.ip.b;
    sc y_inv = sc_inv(y);
    std::vector<const ge*> pts;
    std::vector<sc> scs;
    {
        sc yacc = sc_one(), two = sc_one();
        for (uint32_t i = 0; i < N; i++) {
            if (i % n == 0) two = sc_one();
            pts.push_back(&gens.G[i]);
            scs.push_back(sc_add(sc_mul(a, s[i]), z));
            pts.push_back(&gens.H[i]);
            sc zz = sc_mul(z2, z_pows[i / n]);
            sc term = sc_sub(sc_mul(sc_mul(b, s[N - 1 - i]), yacc),
                             sc_add(z, sc_mul(sc_mul(zz, two), yacc)));
            scs.push_back(term);
            yacc = sc_mul(yacc, y_inv);
            two = sc_add(two, two);
        }
    }
    pts.push_back(&gens.g);
    scs.push_back(sc_mul(sc_sub(sc_mul(a, b), proof.t_hat), w));
    pts.push_back(&gens.h);
    scs.push_back(proof.mu);
    pts.push_back(&A);
    scs.push_back(sc_neg(sc_one()));
    pts.push_back(&S);
    scs.push_back(sc_neg(x));
    for (uint32_t j = 0; j < k; j++) {
        pts.push_back(&Lp[j]);
        scs.push_back(sc_neg(sc_mul(us[j], us[j])));
        pts.push_back(&Rp[j]);
        scs.push_back(sc_neg(sc_mul(us_inv[j], us_inv[j])));
    }
    return ge_is_identity(ge_mul8(msm(pts, scs)));   // cofactored check
}

// --- serialization -----------------------------------------------------------
static void put_u32(std::vector<uint8_t>& v, uint32_t x) {
    v.push_back(uint8_t(x));
    v.push_back(uint8_t(x >> 8));
    v.push_back(uint8_t(x >> 16));
    v.push_back(uint8_t(x >> 24));
}

std::vector<uint8_t> serialize(const RangeProof& p) {
    std::vector<uint8_t> v;
    put_u32(v, p.n);
    auto put32 = [&](const uint8_t* b) { v.insert(v.end(), b, b + 32); };
    put32(p.V); put32(p.A); put32(p.S); put32(p.T1); put32(p.T2);
    uint8_t b[32];
    sc_to_bytes(b, p.taux); put32(b);
    sc_to_bytes(b, p.mu); put32(b);
    sc_to_bytes(b, p.t_hat); put32(b);
    put_u32(v, (uint32_t)p.ip.L.size());
    for (size_t j = 0; j < p.ip.L.size(); j++) {
        put32(p.ip.L[j].data());
        put32(p.ip.R[j].data());
    }
    sc_to_bytes(b, p.ip.a); put32(b);
    sc_to_bytes(b, p.ip.b); put32(b);
    return v;
}

bool deserialize(RangeProof& out, const uint8_t* data, size_t len) {
    size_t off = 0;
    auto get_u32 = [&](uint32_t& x) {
        if (off + 4 > len) return false;
        x = uint32_t(data[off]) | (uint32_t(data[off+1]) << 8)
          | (uint32_t(data[off+2]) << 16) | (uint32_t(data[off+3]) << 24);
        off += 4;
        return true;
    };
    auto get32 = [&](uint8_t* b) {
        if (off + 32 > len) return false;
        memcpy(b, data + off, 32);
        off += 32;
        return true;
    };
    if (!get_u32(out.n)) return false;
    if (!get32(out.V) || !get32(out.A) || !get32(out.S) ||
        !get32(out.T1) || !get32(out.T2)) return false;
    uint8_t b[32];
    if (!get32(b)) return false;
    out.taux = sc_from_bytes(b);
    if (!get32(b)) return false;
    out.mu = sc_from_bytes(b);
    if (!get32(b)) return false;
    out.t_hat = sc_from_bytes(b);
    uint32_t k;
    if (!get_u32(k)) return false;
    if (k > 32) return false;
    out.ip.L.resize(k);
    out.ip.R.resize(k);
    for (uint32_t j = 0; j < k; j++) {
        if (!get32(out.ip.L[j].data()) || !get32(out.ip.R[j].data())) return false;
    }
    if (!get32(b)) return false;
    out.ip.a = sc_from_bytes(b);
    if (!get32(b)) return false;
    out.ip.b = sc_from_bytes(b);
    out.ip.n = k ? (1u << k) : 1;
    return off == len;
}

std::vector<uint8_t> serialize_agg(const AggregatedRangeProof& p) {
    std::vector<uint8_t> v;
    put_u32(v, p.n);
    put_u32(v, p.m);
    auto put32 = [&](const uint8_t* b) { v.insert(v.end(), b, b + 32); };
    for (uint32_t j = 0; j < p.m; j++) put32(p.V[j].data());
    put32(p.A); put32(p.S); put32(p.T1); put32(p.T2);
    uint8_t b[32];
    sc_to_bytes(b, p.taux); put32(b);
    sc_to_bytes(b, p.mu); put32(b);
    sc_to_bytes(b, p.t_hat); put32(b);
    put_u32(v, (uint32_t)p.ip.L.size());
    for (size_t j = 0; j < p.ip.L.size(); j++) {
        put32(p.ip.L[j].data());
        put32(p.ip.R[j].data());
    }
    sc_to_bytes(b, p.ip.a); put32(b);
    sc_to_bytes(b, p.ip.b); put32(b);
    return v;
}

bool deserialize_agg(AggregatedRangeProof& out, const uint8_t* data, size_t len) {
    size_t off = 0;
    auto get_u32 = [&](uint32_t& x) {
        if (off + 4 > len) return false;
        x = uint32_t(data[off]) | (uint32_t(data[off+1]) << 8)
          | (uint32_t(data[off+2]) << 16) | (uint32_t(data[off+3]) << 24);
        off += 4;
        return true;
    };
    auto get32 = [&](uint8_t* b) {
        if (off + 32 > len) return false;
        memcpy(b, data + off, 32);
        off += 32;
        return true;
    };
    if (!get_u32(out.n) || !get_u32(out.m)) return false;
    if (out.m > (1u << 20)) return false;
    out.V.resize(out.m);
    for (uint32_t j = 0; j < out.m; j++)
        if (!get32(out.V[j].data())) return false;
    if (!get32(out.A) || !get32(out.S) || !get32(out.T1) || !get32(out.T2))
        return false;
    uint8_t b[32];
    if (!get32(b)) return false;
    out.taux = sc_from_bytes(b);
    if (!get32(b)) return false;
    out.mu = sc_from_bytes(b);
    if (!get32(b)) return false;
    out.t_hat = sc_from_bytes(b);
    uint32_t k;
    if (!get_u32(k)) return false;
    if (k > 32) return false;
    out.ip.L.resize(k);
    out.ip.R.resize(k);
    for (uint32_t j = 0; j < k; j++) {
        if (!get32(out.ip.L[j].data()) || !get32(out.ip.R[j].data())) return false;
    }
    if (!get32(b)) return false;
    out.ip.a = sc_from_bytes(b);
    if (!get32(b)) return false;
    out.ip.b = sc_from_bytes(b);
    out.ip.n = k ? (1u << k) : 1;
    return off == len;
}

}  // namespace bp
