// Bulletproof range proofs — native CPU protocol path.
//
// Byte-compatible with the Python/TPU implementation (same transcript
// construction, domain separators, generator derivation and proof wire
// format), so proofs interoperate across the native and TPU paths; this is
// the role the reference's host C++ protocol plays
// (bulletproof_range_proof.cu:1159-1812), with correct mod-l scalar algebra
// and exact verification.
#pragma once
#include <array>
#include <cstdint>
#include <vector>

#include "group25519.h"
#include "scalar25519.h"
#include "sha256.h"

namespace bp {

// --- transcript (parity: cudabulletproof_tpu/models/transcript.py) ----------
struct Transcript {
    uint8_t state[32];

    explicit Transcript(const char* label) {
        sha256(label, strlen(label), state);
    }

    void append(const void* label, size_t label_len, const void* data, size_t n) {
        Sha256 h;
        h.update(state, 32);
        h.update(label, label_len);
        h.update(data, n);
        h.final(state);
    }

    void append_point(const char* label, const uint8_t c[32]) {
        append(label, strlen(label), c, 32);
    }

    void append_scalar(const char* label, const sc& s) {
        uint8_t b[32];
        sc_to_bytes(b, s);
        append(label, strlen(label), b, 32);
    }

    void append_u32(const char* label, uint32_t v) {
        uint8_t b[4] = {uint8_t(v), uint8_t(v >> 8), uint8_t(v >> 16), uint8_t(v >> 24)};
        append(label, strlen(label), b, 4);
    }

    sc challenge(const char* domain) {
        Sha256 h;
        h.update(domain, strlen(domain));
        h.update(state, 32);
        uint8_t d[32];
        h.final(d);
        d[31] &= 0x7F;                    // parity: bulletproof_challenge.cu:6-21
        sc c = sc_from_bytes(d);
        if (sc_is_zero(c)) c = sc_one();
        uint8_t cb[32];
        sc_to_bytes(cb, c);
        uint8_t payload[64 + 32];
        size_t dl = strlen(domain);
        // append(b"chal", domain || c_bytes)
        Sha256 h2;
        h2.update(state, 32);
        h2.update("chal", 4);
        h2.update(domain, dl);
        h2.update(cb, 32);
        h2.final(state);
        (void)payload;
        return c;
    }
};

// --- generators (parity: utils/oracle.hash_to_point) -------------------------
ge hash_to_point(const char* label, uint64_t index);

struct Generators {
    uint32_t n;
    ge g, h;
    std::vector<ge> G, H;
};

Generators make_generators(uint32_t n);

// --- proofs ------------------------------------------------------------------
struct InnerProductProof {
    uint32_t n;
    std::vector<std::array<uint8_t, 32>> L, R;
    sc a, b;
};

struct RangeProof {
    uint32_t n;
    uint8_t V[32], A[32], S[32], T1[32], T2[32];
    sc taux, mu, t_hat;
    InnerProductProof ip;
};

// wire format (shared with python models/serialization.py):
//   u32 n | V A S T1 T2 (32 each) | taux mu t_hat (32 each) | u32 k | k*(L,R) | a b
std::vector<uint8_t> serialize(const RangeProof& p);
bool deserialize(RangeProof& out, const uint8_t* data, size_t len);

bool prove_range(RangeProof& out, uint64_t value, const sc& gamma, uint32_t nbits,
                 const Generators& gens);
bool verify_range(const RangeProof& proof, const Generators& gens);

// --- aggregated proofs (m values, one proof; models/aggregate.py parity) -----
struct AggregatedRangeProof {
    uint32_t n;                                   // bits per value
    uint32_t m;                                   // number of values
    std::vector<std::array<uint8_t, 32>> V;      // m commitments
    uint8_t A[32], S[32], T1[32], T2[32];
    sc taux, mu, t_hat;
    InnerProductProof ip;
};

// wire format (python utils/serialization.py::serialize_aggregated_proof):
//   u32 n | u32 m | m*V | A S T1 T2 | taux mu t_hat | u32 k | k*(L,R) | a b
std::vector<uint8_t> serialize_agg(const AggregatedRangeProof& p);
bool deserialize_agg(AggregatedRangeProof& out, const uint8_t* data, size_t len);

bool prove_agg(AggregatedRangeProof& out, const uint64_t* values,
               const sc* gammas, uint32_t m, uint32_t nbits,
               const Generators& gens);
bool verify_agg(const AggregatedRangeProof& proof, const Generators& gens);

sc sc_random();

}  // namespace bp
