// fe25519: field arithmetic mod 2^255-19 with 5x51-bit limbs (uint64 +
// unsigned __int128 products).  Deliberately a *different* radix from both
// the CUDA reference (4x64, curve25519_ops.h:15-17) and the TPU kernels
// (20x13): this is the idiomatic shape for a 64-bit host CPU, and serves as
// the native differential-test oracle for the JAX/Pallas layers.
// All chains (inversion, sqrt) are complete -- the reference's fe25519_invert
// is broken (curve25519_ops.cu:157-207); this one is exact.
#pragma once
#include <cstdint>
#include <cstring>

namespace bp {

typedef unsigned __int128 u128;

struct fe {
    uint64_t v[5];
};

constexpr uint64_t M51 = (uint64_t(1) << 51) - 1;

inline fe fe_zero() { return fe{{0, 0, 0, 0, 0}}; }
inline fe fe_one() { return fe{{1, 0, 0, 0, 0}}; }

inline fe fe_add(const fe& a, const fe& b) {
    fe r;
    for (int i = 0; i < 5; i++) r.v[i] = a.v[i] + b.v[i];
    return r;
}

// a - b + 2p (limbwise), keeping limbs positive
inline fe fe_sub(const fe& a, const fe& b) {
    fe r;
    r.v[0] = a.v[0] + 0xFFFFFFFFFFFDAull - b.v[0];
    for (int i = 1; i < 5; i++) r.v[i] = a.v[i] + 0xFFFFFFFFFFFFEull - b.v[i];
    return r;
}

inline fe fe_carry(const fe& a) {
    fe r = a;
    uint64_t c;
    c = r.v[0] >> 51; r.v[0] &= M51; r.v[1] += c;
    c = r.v[1] >> 51; r.v[1] &= M51; r.v[2] += c;
    c = r.v[2] >> 51; r.v[2] &= M51; r.v[3] += c;
    c = r.v[3] >> 51; r.v[3] &= M51; r.v[4] += c;
    c = r.v[4] >> 51; r.v[4] &= M51; r.v[0] += c * 19;
    c = r.v[0] >> 51; r.v[0] &= M51; r.v[1] += c;
    return r;
}

inline fe fe_mul(const fe& f, const fe& g) {
    u128 r0 = (u128)f.v[0]*g.v[0] + (u128)(19*f.v[1])*g.v[4] + (u128)(19*f.v[2])*g.v[3]
            + (u128)(19*f.v[3])*g.v[2] + (u128)(19*f.v[4])*g.v[1];
    u128 r1 = (u128)f.v[0]*g.v[1] + (u128)f.v[1]*g.v[0] + (u128)(19*f.v[2])*g.v[4]
            + (u128)(19*f.v[3])*g.v[3] + (u128)(19*f.v[4])*g.v[2];
    u128 r2 = (u128)f.v[0]*g.v[2] + (u128)f.v[1]*g.v[1] + (u128)f.v[2]*g.v[0]
            + (u128)(19*f.v[3])*g.v[4] + (u128)(19*f.v[4])*g.v[3];
    u128 r3 = (u128)f.v[0]*g.v[3] + (u128)f.v[1]*g.v[2] + (u128)f.v[2]*g.v[1]
            + (u128)f.v[3]*g.v[0] + (u128)(19*f.v[4])*g.v[4];
    u128 r4 = (u128)f.v[0]*g.v[4] + (u128)f.v[1]*g.v[3] + (u128)f.v[2]*g.v[2]
            + (u128)f.v[3]*g.v[1] + (u128)f.v[4]*g.v[0];
    uint64_t c;
    fe out;
    c = (uint64_t)(r0 >> 51); out.v[0] = (uint64_t)r0 & M51; r1 += c;
    c = (uint64_t)(r1 >> 51); out.v[1] = (uint64_t)r1 & M51; r2 += c;
    c = (uint64_t)(r2 >> 51); out.v[2] = (uint64_t)r2 & M51; r3 += c;
    c = (uint64_t)(r3 >> 51); out.v[3] = (uint64_t)r3 & M51; r4 += c;
    c = (uint64_t)(r4 >> 51); out.v[4] = (uint64_t)r4 & M51;
    out.v[0] += c * 19;
    c = out.v[0] >> 51; out.v[0] &= M51; out.v[1] += c;
    return out;
}

inline fe fe_sq(const fe& a) { return fe_mul(a, a); }

inline fe fe_mul_small(const fe& a, uint64_t k) {
    u128 t;
    fe r;
    uint64_t c = 0;
    for (int i = 0; i < 5; i++) {
        t = (u128)a.v[i] * k + c;
        r.v[i] = (uint64_t)t & M51;
        c = (uint64_t)(t >> 51);
    }
    r.v[0] += c * 19;
    return fe_carry(r);
}

inline fe fe_sqn(fe a, int n) {
    for (int i = 0; i < n; i++) a = fe_sq(a);
    return a;
}

// z^(2^250 - 1) shared chain prefix
inline void fe_chain250(const fe& z, fe& z_250_0, fe& z11) {
    fe z2 = fe_sq(z);
    fe z9 = fe_mul(z, fe_sqn(z2, 2));
    z11 = fe_mul(z2, z9);
    fe z_5_0 = fe_mul(z9, fe_sq(z11));
    fe z_10_0 = fe_mul(fe_sqn(z_5_0, 5), z_5_0);
    fe z_20_0 = fe_mul(fe_sqn(z_10_0, 10), z_10_0);
    fe z_40_0 = fe_mul(fe_sqn(z_20_0, 20), z_20_0);
    fe z_50_0 = fe_mul(fe_sqn(z_40_0, 10), z_10_0);
    fe z_100_0 = fe_mul(fe_sqn(z_50_0, 50), z_50_0);
    fe z_200_0 = fe_mul(fe_sqn(z_100_0, 100), z_100_0);
    z_250_0 = fe_mul(fe_sqn(z_200_0, 50), z_50_0);
}

inline fe fe_invert(const fe& z) {     // z^(2^255 - 21), complete chain
    fe z_250_0, z11;
    fe_chain250(z, z_250_0, z11);
    return fe_mul(fe_sqn(z_250_0, 5), z11);
}

inline fe fe_pow2523(const fe& z) {    // z^(2^252 - 3)
    fe z_250_0, z11;
    fe_chain250(z, z_250_0, z11);
    return fe_mul(fe_sqn(z_250_0, 2), z);
}

inline void fe_tobytes(uint8_t s[32], const fe& a) {
    fe t = fe_carry(fe_carry(a));
    // conditional subtract p:  t >= p  <=>  t + 19 carries past bit 255
    uint64_t q = (t.v[0] + 19) >> 51;
    q = (t.v[1] + q) >> 51;
    q = (t.v[2] + q) >> 51;
    q = (t.v[3] + q) >> 51;
    q = (t.v[4] + q) >> 51;
    t.v[0] += 19 * q;
    uint64_t c;
    c = t.v[0] >> 51; t.v[0] &= M51; t.v[1] += c;
    c = t.v[1] >> 51; t.v[1] &= M51; t.v[2] += c;
    c = t.v[2] >> 51; t.v[2] &= M51; t.v[3] += c;
    c = t.v[3] >> 51; t.v[3] &= M51; t.v[4] += c;
    t.v[4] &= M51;
    uint64_t w0 = t.v[0] | (t.v[1] << 51);
    uint64_t w1 = (t.v[1] >> 13) | (t.v[2] << 38);
    uint64_t w2 = (t.v[2] >> 26) | (t.v[3] << 25);
    uint64_t w3 = (t.v[3] >> 39) | (t.v[4] << 12);
    memcpy(s, &w0, 8); memcpy(s + 8, &w1, 8);
    memcpy(s + 16, &w2, 8); memcpy(s + 24, &w3, 8);
}

inline fe fe_frombytes(const uint8_t s[32]) {
    uint64_t w0, w1, w2, w3;
    memcpy(&w0, s, 8); memcpy(&w1, s + 8, 8);
    memcpy(&w2, s + 16, 8); memcpy(&w3, s + 24, 8);
    fe r;
    r.v[0] = w0 & M51;
    r.v[1] = ((w0 >> 51) | (w1 << 13)) & M51;
    r.v[2] = ((w1 >> 38) | (w2 << 26)) & M51;
    r.v[3] = ((w2 >> 25) | (w3 << 39)) & M51;
    r.v[4] = (w3 >> 12) & M51;   // note: drops bit 255 (sign bit handled by caller)
    return r;
}

inline bool fe_iszero(const fe& a) {
    uint8_t s[32];
    fe_tobytes(s, a);
    uint8_t acc = 0;
    for (int i = 0; i < 32; i++) acc |= s[i];
    return acc == 0;
}

inline bool fe_eq(const fe& a, const fe& b) {
    uint8_t s[32], t[32];
    fe_tobytes(s, a);
    fe_tobytes(t, b);
    return memcmp(s, t, 32) == 0;
}

inline int fe_isneg(const fe& a) {   // canonical parity bit
    uint8_t s[32];
    fe_tobytes(s, a);
    return s[0] & 1;
}

inline fe fe_neg(const fe& a) { return fe_carry(fe_sub(fe_zero(), a)); }

}  // namespace bp
