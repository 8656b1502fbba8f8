// CLI test/bench driver — native parity with the reference's
// complete_bulletproof_test.cu:65-308 contract:
//   * prove value 42 in [0, 2^16) and verify (must SUCCEED)
//   * attempt value 65536 = 2^16 (prover must refuse; a forged proof must
//     FAIL verification — stronger than the reference, which only checks the
//     prover-side refusal)
//   * field-op microbenchmarks (batch add/mul/square, 10,000 elements,
//     parity with complete_bulletproof_test.cu:257-299)
#include <chrono>
#include <cstdio>
#include <cstring>
#include <vector>

#include "bulletproof.h"

using namespace bp;
using Clock = std::chrono::steady_clock;

static double secs(Clock::time_point a, Clock::time_point b) {
    return std::chrono::duration<double>(b - a).count();
}

int main(int argc, char** argv) {
    bool bench = argc > 1 && strcmp(argv[1], "--benchmark") == 0;
    printf("=== tpu-bulletproofs native CPU driver ===\n");
    const uint32_t nbits = 16;
    auto t0 = Clock::now();
    Generators gens = make_generators(nbits);
    printf("generator setup: %.3fs\n", secs(t0, Clock::now()));

    // positive test: value 42
    sc gamma = sc_random();
    RangeProof proof;
    t0 = Clock::now();
    bool ok = prove_range(proof, 42, gamma, nbits, gens);
    double t_prove = secs(t0, Clock::now());
    printf("prove(42): %s in %.4fs\n", ok ? "ok" : "FAILED", t_prove);
    if (!ok) return 1;

    t0 = Clock::now();
    bool verified = verify_range(proof, gens);
    double t_verify = secs(t0, Clock::now());
    printf("verify(42): %s in %.4fs\n", verified ? "SUCCESS" : "FAILED", t_verify);
    if (!verified) return 1;

    // serialization round-trip
    auto wire = serialize(proof);
    RangeProof p2;
    if (!deserialize(p2, wire.data(), wire.size()) || !verify_range(p2, gens)) {
        printf("serialization round-trip: FAILED\n");
        return 1;
    }
    printf("serialization round-trip (%zu bytes): ok\n", wire.size());

    // negative test 1: prover refuses 65536 = 2^16
    RangeProof bad;
    bool refused = !prove_range(bad, 65536, gamma, nbits, gens);
    printf("prove(65536) refused: %s\n", refused ? "ok (CORRECT)" : "FAILED");
    if (!refused) return 1;

    // negative test 2: tampered proof must fail verification
    RangeProof tam = proof;
    tam.t_hat = sc_add(tam.t_hat, sc_one());
    bool rejected = !verify_range(tam, gens);
    printf("tampered proof rejected: %s\n", rejected ? "ok (CORRECT)" : "FAILED");
    if (!rejected) return 1;

    if (bench) {
        const size_t N = 10000;
        std::vector<uint8_t> a(32 * N), b(32 * N), out(32 * N);
        for (size_t i = 0; i < 32 * N; i++) {
            a[i] = uint8_t(i * 7 + 1);
            b[i] = uint8_t(i * 13 + 3);
        }
        for (size_t i = 0; i < N; i++) {
            a[32 * i + 31] &= 0x0F;     // keep < p
            b[32 * i + 31] &= 0x0F;
        }
        extern void bench_fields(const uint8_t*, const uint8_t*, uint8_t*, size_t);
        t0 = Clock::now();
        for (size_t i = 0; i < N; i++) {
            fe x = fe_frombytes(&a[32 * i]), y = fe_frombytes(&b[32 * i]);
            fe_tobytes(&out[32 * i], fe_carry(fe_add(x, y)));
        }
        printf("batch field add  (%zu): %.6fs\n", N, secs(t0, Clock::now()));
        t0 = Clock::now();
        for (size_t i = 0; i < N; i++) {
            fe x = fe_frombytes(&a[32 * i]), y = fe_frombytes(&b[32 * i]);
            fe_tobytes(&out[32 * i], fe_mul(x, y));
        }
        printf("batch field mul  (%zu): %.6fs\n", N, secs(t0, Clock::now()));
        t0 = Clock::now();
        for (size_t i = 0; i < N; i++) {
            fe x = fe_frombytes(&a[32 * i]);
            fe_tobytes(&out[32 * i], fe_sq(x));
        }
        printf("batch field sq   (%zu): %.6fs\n", N, secs(t0, Clock::now()));
    }

    printf("ALL PASSED\n");
    return 0;
}
