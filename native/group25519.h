// ge25519: twisted-Edwards (a=-1) extended coordinates, matching the group
// law of the TPU layer (ops/curve.py) and the reference's ge25519 struct
// (curve25519_ops.h:20-25) — with real decompression, on-curve checks and a
// correct normalize (the reference's device normalize is a stub,
// device_curve25519_ops.cuh:243-270).
#pragma once
#include "field25519.h"

namespace bp {

// d and 2d for ed25519; sqrt(-1)
inline const fe& fe_d() {
    static const fe v = [] {
        // d = -121665/121666 mod p
        fe n = fe_neg(fe{{121665, 0, 0, 0, 0}});
        return fe_mul(n, fe_invert(fe{{121666, 0, 0, 0, 0}}));
    }();
    return v;
}

inline const fe& fe_d2() {
    static const fe v = fe_carry(fe_add(fe_d(), fe_d()));
    return v;
}

inline const fe& fe_sqrtm1() {
    // sqrt(-1) = 2^((p-1)/4) mod p, canonical little-endian encoding
    static const uint8_t bytes[32] = {
        0xb0, 0xa0, 0x0e, 0x4a, 0x27, 0x1b, 0xee, 0xc4,
        0x78, 0xe4, 0x2f, 0xad, 0x06, 0x18, 0x43, 0x2f,
        0xa7, 0xd7, 0xfb, 0x3d, 0x99, 0x00, 0x4d, 0x2b,
        0x0b, 0xdf, 0xc1, 0x4f, 0x80, 0x24, 0x83, 0x2b};
    static const fe v = fe_frombytes(bytes);
    return v;
}

struct ge {
    fe X, Y, Z, T;
};

inline ge ge_identity() { return ge{fe_zero(), fe_one(), fe_one(), fe_zero()}; }

// unified add-2008-hwcd-3 (a=-1); same formula family as ops/curve.py::add
inline ge ge_add(const ge& p, const ge& q) {
    fe A = fe_mul(fe_carry(fe_sub(p.Y, p.X)), fe_carry(fe_sub(q.Y, q.X)));
    fe B = fe_mul(fe_carry(fe_add(p.Y, p.X)), fe_carry(fe_add(q.Y, q.X)));
    fe C = fe_mul(fe_mul(p.T, fe_d2()), q.T);
    fe ZZ = fe_mul(p.Z, q.Z);
    fe D = fe_carry(fe_add(ZZ, ZZ));
    fe E = fe_carry(fe_sub(B, A));
    fe F = fe_carry(fe_sub(D, C));
    fe G = fe_carry(fe_add(D, C));
    fe H = fe_carry(fe_add(B, A));
    return ge{fe_mul(E, F), fe_mul(G, H), fe_mul(F, G), fe_mul(E, H)};
}

inline ge ge_double(const ge& p) { return ge_add(p, p); }

inline ge ge_neg(const ge& p) { return ge{fe_neg(p.X), p.Y, p.Z, fe_neg(p.T)}; }

inline ge ge_sub(const ge& p, const ge& q) { return ge_add(p, ge_neg(q)); }

// variable-time double-and-add over a 32-byte little-endian scalar
inline ge ge_scalarmult(const ge& p, const uint8_t s[32]) {
    ge acc = ge_identity();
    for (int i = 255; i >= 0; i--) {
        acc = ge_double(acc);
        if ((s[i >> 3] >> (i & 7)) & 1) acc = ge_add(acc, p);
    }
    return acc;
}

inline void ge_tobytes(uint8_t out[32], const ge& p) {
    fe zi = fe_invert(p.Z);
    fe x = fe_mul(p.X, zi);
    fe y = fe_mul(p.Y, zi);
    fe_tobytes(out, y);
    out[31] ^= uint8_t(fe_isneg(x) << 7);
}

// decompress; returns false if not a curve point / non-canonical
inline bool ge_frombytes(ge& out, const uint8_t s[32]) {
    // canonical y check: y < p
    {
        uint8_t t[32];
        fe y0 = fe_frombytes(s);
        fe_tobytes(t, y0);
        uint8_t cmp[32];
        memcpy(cmp, s, 32);
        cmp[31] &= 0x7F;
        if (memcmp(t, cmp, 32) != 0) return false;
    }
    int sign = s[31] >> 7;
    fe y = fe_frombytes(s);
    fe y2 = fe_sq(y);
    fe u = fe_carry(fe_sub(y2, fe_one()));
    fe v = fe_carry(fe_add(fe_mul(fe_d(), y2), fe_one()));
    fe v3 = fe_mul(fe_sq(v), v);
    fe v7 = fe_mul(fe_sq(v3), v);
    fe x = fe_mul(fe_mul(u, v3), fe_pow2523(fe_mul(u, v7)));
    fe vx2 = fe_mul(v, fe_sq(x));
    if (!fe_eq(vx2, u)) {
        if (!fe_eq(vx2, fe_neg(u))) return false;
        x = fe_mul(x, fe_sqrtm1());
    }
    if (fe_iszero(x) && sign) return false;
    if (fe_isneg(x) != sign) x = fe_neg(x);
    out = ge{x, y, fe_one(), fe_mul(x, y)};
    return true;
}

inline bool ge_eq(const ge& p, const ge& q) {
    return fe_eq(fe_mul(p.X, q.Z), fe_mul(q.X, p.Z)) &&
           fe_eq(fe_mul(p.Y, q.Z), fe_mul(q.Y, p.Z));
}

inline bool ge_is_identity(const ge& p) {
    return fe_iszero(p.X) && fe_eq(p.Y, p.Z);
}

// [8]P — cofactor clearing for ed25519's Z_8 torsion subgroup
inline ge ge_mul8(const ge& p) { return ge_double(ge_double(ge_double(p))); }

// P in E[8]? Verifiers reject small-order proof points and multiply their
// final multiexp checks by 8 (cofactored verification), mirroring
// ops/curve.py::is_small_order.  The reference validates nothing
// (ge25519_is_on_curve stub, curve25519_ops.cu:534-541).
inline bool ge_is_small_order(const ge& p) {
    return ge_is_identity(ge_mul8(p));
}

inline bool ge_on_curve(const ge& p) {
    fe x2 = fe_sq(p.X), y2 = fe_sq(p.Y), z2 = fe_sq(p.Z);
    fe lhs = fe_mul(fe_carry(fe_sub(y2, x2)), z2);
    fe rhs = fe_carry(fe_add(fe_sq(z2), fe_mul(fe_d(), fe_mul(x2, y2))));
    return fe_eq(lhs, rhs) && fe_eq(fe_mul(p.T, p.Z), fe_mul(p.X, p.Y));
}

}  // namespace bp
