// C ABI for ctypes: differential-test oracle + host fast path.
// (pybind11 is not available in this image; plain C ABI + ctypes is the
// binding layer — see cudabulletproof_tpu/utils/native.py.)
#include <cstring>
#include <map>
#include <memory>
#include <mutex>

#include "bulletproof.h"

using namespace bp;

extern "C" {

// --- batched field ops (canonical 32-byte LE in/out) -------------------------
void bp_batch_field_mul(const uint8_t* a, const uint8_t* b, uint8_t* out, size_t n) {
    for (size_t i = 0; i < n; i++) {
        fe x = fe_frombytes(a + 32 * i), y = fe_frombytes(b + 32 * i);
        fe_tobytes(out + 32 * i, fe_mul(x, y));
    }
}

void bp_batch_field_add(const uint8_t* a, const uint8_t* b, uint8_t* out, size_t n) {
    for (size_t i = 0; i < n; i++) {
        fe x = fe_frombytes(a + 32 * i), y = fe_frombytes(b + 32 * i);
        fe_tobytes(out + 32 * i, fe_carry(fe_add(x, y)));
    }
}

void bp_batch_field_sub(const uint8_t* a, const uint8_t* b, uint8_t* out, size_t n) {
    for (size_t i = 0; i < n; i++) {
        fe x = fe_frombytes(a + 32 * i), y = fe_frombytes(b + 32 * i);
        fe_tobytes(out + 32 * i, fe_carry(fe_sub(x, y)));
    }
}

void bp_batch_field_square(const uint8_t* a, uint8_t* out, size_t n) {
    for (size_t i = 0; i < n; i++) {
        fe x = fe_frombytes(a + 32 * i);
        fe_tobytes(out + 32 * i, fe_sq(x));
    }
}

void bp_batch_field_invert(const uint8_t* a, uint8_t* out, size_t n) {
    for (size_t i = 0; i < n; i++) {
        fe x = fe_frombytes(a + 32 * i);
        fe_tobytes(out + 32 * i, fe_invert(x));
    }
}

// --- point ops on compressed encodings --------------------------------------
// return 0 on success, nonzero on decode failure
int bp_point_add(const uint8_t* p, const uint8_t* q, uint8_t* out) {
    ge P, Q;
    if (!ge_frombytes(P, p) || !ge_frombytes(Q, q)) return 1;
    ge_tobytes(out, ge_add(P, Q));
    return 0;
}

int bp_point_scalarmult(const uint8_t* p, const uint8_t* scalar32, uint8_t* out) {
    ge P;
    if (!ge_frombytes(P, p)) return 1;
    ge_tobytes(out, ge_scalarmult(P, scalar32));
    return 0;
}

int bp_point_msm(const uint8_t* pts, const uint8_t* scalars, size_t n, uint8_t* out) {
    ge acc = ge_identity();
    for (size_t i = 0; i < n; i++) {
        ge P;
        if (!ge_frombytes(P, pts + 32 * i)) return 1;
        acc = ge_add(acc, ge_scalarmult(P, scalars + 32 * i));
    }
    ge_tobytes(out, acc);
    return 0;
}

int bp_hash_to_point(const char* label, uint64_t index, uint8_t* out) {
    ge_tobytes(out, hash_to_point(label, index));
    return 0;
}

int bp_point_on_curve(const uint8_t* p) {
    ge P;
    if (!ge_frombytes(P, p)) return 0;
    return ge_on_curve(P) ? 1 : 0;
}

// --- scalar ops --------------------------------------------------------------
void bp_scalar_mul(const uint8_t* a, const uint8_t* b, uint8_t* out) {
    sc r = sc_mul(sc_from_bytes(a), sc_from_bytes(b));
    sc_to_bytes(out, r);
}

void bp_scalar_add(const uint8_t* a, const uint8_t* b, uint8_t* out) {
    sc r = sc_add(sc_from_bytes(a), sc_from_bytes(b));
    sc_to_bytes(out, r);
}

void bp_scalar_invert(const uint8_t* a, uint8_t* out) {
    sc r = sc_inv(sc_from_bytes(a));
    sc_to_bytes(out, r);
}

void bp_scalar_reduce_wide(const uint8_t* a64, uint8_t* out) {
    sc r = sc_from_bytes_wide(a64);
    sc_to_bytes(out, r);
}

// --- protocol ----------------------------------------------------------------
static std::mutex g_mu;
static std::map<uint32_t, std::unique_ptr<Generators>> g_gens;

static const Generators& gens_for(uint32_t n) {
    std::lock_guard<std::mutex> lk(g_mu);
    auto& slot = g_gens[n];
    if (!slot) slot = std::make_unique<Generators>(make_generators(n));
    return *slot;
}

// proof_buf must have room (<= 4096 bytes for n <= 64); returns proof length
// or 0 on failure (e.g. out-of-range value — prover-side refusal, parity with
// validate_range_input, bulletproof_range_proof.cu:238-263)
size_t bp_prove_range(uint64_t value, const uint8_t* gamma32, uint32_t nbits,
                      uint8_t* proof_buf, size_t buf_len) {
    RangeProof p;
    sc gamma = sc_from_bytes(gamma32);
    if (!prove_range(p, value, gamma, nbits, gens_for(nbits))) return 0;
    auto bytes = serialize(p);
    if (bytes.size() > buf_len) return 0;
    memcpy(proof_buf, bytes.data(), bytes.size());
    return bytes.size();
}

int bp_verify_range(const uint8_t* proof, size_t len) {
    RangeProof p;
    if (!deserialize(p, proof, len)) return 0;
    return verify_range(p, gens_for(p.n)) ? 1 : 0;
}

// aggregated proofs: m values share one proof over n*m generators
// (models/aggregate.py parity).  Returns proof length or 0 on failure.
size_t bp_prove_agg(const uint64_t* values, const uint8_t* gammas32,
                    uint32_t m, uint32_t nbits, uint8_t* proof_buf,
                    size_t buf_len) {
    AggregatedRangeProof p;
    std::vector<sc> gammas(m);
    for (uint32_t j = 0; j < m; j++) gammas[j] = sc_from_bytes(gammas32 + 32 * j);
    if (!prove_agg(p, values, gammas.data(), m, nbits, gens_for(nbits * m)))
        return 0;
    auto bytes = serialize_agg(p);
    if (bytes.size() > buf_len) return 0;
    memcpy(proof_buf, bytes.data(), bytes.size());
    return bytes.size();
}

int bp_verify_agg(const uint8_t* proof, size_t len) {
    AggregatedRangeProof p;
    if (!deserialize_agg(p, proof, len)) return 0;
    return verify_agg(p, gens_for(p.n * p.m)) ? 1 : 0;
}

// commitment for cross-checking: out = value*g + gamma*h
void bp_pedersen_commit(uint64_t value, const uint8_t* gamma32, uint32_t nbits,
                        uint8_t* out) {
    const Generators& g = gens_for(nbits);
    sc v = sc_zero();
    v.v[0] = value;
    uint8_t vb[32], gb[32];
    sc_to_bytes(vb, v);
    memcpy(gb, gamma32, 32);
    ge r = ge_add(ge_scalarmult(g.g, vb), ge_scalarmult(g.h, gb));
    ge_tobytes(out, r);
}

}  // extern "C"
