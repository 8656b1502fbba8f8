// sc25519: arithmetic mod the group order l = 2^252 + delta.
// The CUDA reference has no scalar field at all (it does exponent arithmetic
// mod p, which breaks the exponent algebra); correct Bulletproofs needs
// mod-l, implemented here as 4x64 limbs with schoolbook 512-bit products and
// Barrett reduction.
#pragma once
#include <cstdint>
#include <cstring>

namespace bp {

typedef unsigned __int128 u128;

struct sc {
    uint64_t v[4];       // little-endian, value < l
};

// l (group order) as 4x64
inline const uint64_t SC_L[4] = {
    0x5812631a5cf5d3edull, 0x14def9dea2f79cd6ull, 0x0ull, 0x1000000000000000ull};

// mu = floor(2^512 / l), 260 bits -> 5x64
inline const uint64_t SC_MU[5] = {
    0xed9ce5a30a2c131bull, 0x2106215d086329a7ull, 0xffffffffffffffebull,
    0xffffffffffffffffull, 0x000000000000000full};

inline int sc_cmp256(const uint64_t a[4], const uint64_t b[4]) {
    for (int i = 3; i >= 0; i--) {
        if (a[i] < b[i]) return -1;
        if (a[i] > b[i]) return 1;
    }
    return 0;
}

inline void sc_sub256(uint64_t r[4], const uint64_t a[4], const uint64_t b[4]) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a[i] - b[i] - borrow;
        r[i] = (uint64_t)d;
        borrow = (d >> 64) & 1;
    }
}

// r[n+m] = a[n] * b[m]
template <int N, int M>
inline void mul_words(uint64_t r[N + M], const uint64_t a[N], const uint64_t b[M]) {
    memset(r, 0, sizeof(uint64_t) * (N + M));
    for (int i = 0; i < N; i++) {
        uint64_t carry = 0;
        for (int j = 0; j < M; j++) {
            u128 t = (u128)a[i] * b[j] + r[i + j] + carry;
            r[i + j] = (uint64_t)t;
            carry = (uint64_t)(t >> 64);
        }
        r[i + M] += carry;
    }
}

// Barrett: x (512 bits) mod l
inline sc sc_reduce512(const uint64_t x[8]) {
    // q1 = x >> 248  (floor(x / 2^248), 264 bits -> 5 words is enough since
    // x < l^2 < 2^506 => q1 < 2^258)
    uint64_t q1[5];
    for (int i = 0; i < 5; i++) {
        uint64_t lo = x[i + 3] >> 56;
        uint64_t hi = (i + 4 < 8) ? (x[i + 4] << 8) : 0;
        q1[i] = lo | hi;
    }
    // q2 = q1 * mu  (10 words); q3 = q2 >> 264
    uint64_t q2[10];
    mul_words<5, 5>(q2, q1, SC_MU);
    uint64_t q3[5];
    for (int i = 0; i < 5; i++) {
        uint64_t lo = q2[i + 4] >> 8;
        uint64_t hi = (i + 5 < 10) ? (q2[i + 5] << 56) : 0;
        q3[i] = lo | hi;
    }
    // r = x - q3 * l  (mod 2^320), guaranteed < 3l < 2^255
    uint64_t q3l[9];
    mul_words<5, 4>(q3l, q3, SC_L);
    uint64_t r[5];
    u128 borrow = 0;
    for (int i = 0; i < 5; i++) {
        u128 d = (u128)x[i] - q3l[i] - borrow;
        r[i] = (uint64_t)d;
        borrow = (d >> 64) & 1;
    }
    sc out;
    memcpy(out.v, r, 32);
    while (sc_cmp256(out.v, SC_L) >= 0) sc_sub256(out.v, out.v, SC_L);
    return out;
}

inline sc sc_from_bytes_wide(const uint8_t s[64]) {
    uint64_t x[8];
    memcpy(x, s, 64);
    return sc_reduce512(x);
}

inline sc sc_from_bytes(const uint8_t s[32]) {
    uint64_t x[8] = {0};
    memcpy(x, s, 32);
    return sc_reduce512(x);
}

inline void sc_to_bytes(uint8_t out[32], const sc& a) { memcpy(out, a.v, 32); }

inline sc sc_zero() { return sc{{0, 0, 0, 0}}; }
inline sc sc_one() { return sc{{1, 0, 0, 0}}; }

inline sc sc_add(const sc& a, const sc& b) {
    sc r;
    u128 carry = 0;
    for (int i = 0; i < 4; i++) {
        u128 t = (u128)a.v[i] + b.v[i] + carry;
        r.v[i] = (uint64_t)t;
        carry = t >> 64;
    }
    if (carry || sc_cmp256(r.v, SC_L) >= 0) sc_sub256(r.v, r.v, SC_L);
    return r;
}

inline sc sc_sub(const sc& a, const sc& b) {
    sc r;
    if (sc_cmp256(a.v, b.v) >= 0) {
        sc_sub256(r.v, a.v, b.v);
    } else {
        uint64_t t[4];
        sc_sub256(t, b.v, a.v);          // b - a
        sc_sub256(r.v, SC_L, t);         // l - (b - a)
    }
    return r;
}

inline sc sc_mul(const sc& a, const sc& b) {
    uint64_t x[8];
    mul_words<4, 4>(x, a.v, b.v);
    return sc_reduce512(x);
}

inline bool sc_is_zero(const sc& a) {
    return (a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0;
}

inline bool sc_eq(const sc& a, const sc& b) { return memcmp(a.v, b.v, 32) == 0; }

// Fermat inversion: a^(l-2) via square-and-multiply (vartime, host only)
inline sc sc_inv(const sc& a) {
    uint64_t e[4];
    memcpy(e, SC_L, 32);
    // e = l - 2
    uint64_t two[4] = {2, 0, 0, 0};
    sc_sub256(e, e, two);
    sc result = sc_one();
    sc base = a;
    for (int w = 0; w < 4; w++) {
        for (int b = 0; b < 64; b++) {
            if ((e[w] >> b) & 1) result = sc_mul(result, base);
            base = sc_mul(base, base);
        }
    }
    return result;
}

inline sc sc_neg(const sc& a) { return sc_sub(sc_zero(), a); }

}  // namespace bp
