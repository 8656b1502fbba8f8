"""End-to-end test/benchmark driver (`python -m cudabulletproof_tpu`).

Reference parity: complete_bulletproof_test.cu's main() (cu:65-308) — the
reference's only "app".  Same scenario sequence:

  1. deterministic generator setup           (test.cu:33-109; ours are real
     curve points — the reference's hash-derived X/Y pairs are not on the
     curve, SURVEY.md §8.6)
  2. positive test: prove value 42 in [0, 2^16), verify on BOTH paths with
     wall-clock timing + speedup printout     (test.cu:111-191: CUDA vs CPU;
     here: TPU fused verifier vs native C++ CPU verifier)
  3. negative test: value 65536 = 2^16        (test.cu:193-255; the reference
     prover refuses and emits an empty proof — ours refuses too, AND we also
     demonstrate *cryptographic* rejection of a tampered proof, which the
     reference cannot do)
  4. batch field-op microbenchmarks, 10,000 elements (test.cu:257-299)

The reference's Makefile advertises `./cuda_bulletproof_test --benchmark`
but never parses argv (SURVEY.md §5); here --benchmark actually works.
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def _timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    return out, time.perf_counter() - t0


def positive_test(range_bits: int, value: int) -> bool:
    import jax
    from .models import rangeproof as rp
    from .models.generators import get_generators
    from .utils import native, scalars as S

    print(f"=== Positive test: prove {value} in [0, 2^{range_bits}) ===")
    try:
        gens = get_generators(range_bits)
        proof, t_prove = _timed(rp.prove, value, S.sc_random(), range_bits, gens)
    except rp.ProveError as e:
        print(f"Prover error: {e}")
        return False
    print(f"Proof generated in {t_prove:.6f} s (first call includes jit compile)")

    # warm up the jit (the reference's first CUDA call pays context init the
    # same way, BASELINE.md row 4), then time the device path
    rp.verify(proof, gens)
    ok_dev, t_dev = _timed(rp.verify, proof, gens)
    print(f"TPU (fused) verification:  {'SUCCESS' if ok_dev else 'FAILED'}"
          f"  [{t_dev:.6f} s]")

    if native.available():
        ok_nat, t_nat = _timed(rp.verify_fast, proof, gens)
        print(f"Native CPU verification:   {'SUCCESS' if ok_nat else 'FAILED'}"
              f"  [{t_nat:.6f} s]")
        # test.cu:174-180 prints "CUDA Speedup"; the analogous ratio here:
        print(f"Device/native latency ratio: {t_dev / max(t_nat, 1e-9):.2f}x")
    else:
        ok_nat = True
    return ok_dev and ok_nat


def negative_test(range_bits: int) -> bool:
    from .models import rangeproof as rp
    from .models.generators import get_generators
    from .utils import scalars as S, serialization

    bad_value = 1 << range_bits
    print(f"=== Negative test: value {bad_value} = 2^{range_bits} ===")
    gens = get_generators(range_bits)
    try:
        rp.prove(bad_value, S.sc_random(), range_bits, gens)
        print("Prover accepted an out-of-range value: FAILED")
        return False
    except rp.ProveError:
        print("Prover refused out-of-range value: FAILED (CORRECT)")

    # stronger than the reference: a *tampered* valid proof must be rejected
    # by verification itself (the reference only rejects structurally-empty
    # proofs via a length mismatch, SURVEY.md §8.5)
    try:
        proof = rp.prove(3, S.sc_random(), range_bits, gens)
    except rp.ProveError as e:
        print(f"Prover error: {e}")
        return False
    blob = bytearray(serialization.serialize_range_proof(proof))
    blob[40] ^= 1    # flip one bit inside V
    tampered = serialization.deserialize_range_proof(bytes(blob))
    ok = rp.verify(tampered, gens)
    print(f"Tampered-proof verification: {'FAILED (CORRECT)' if not ok else 'ACCEPTED (BUG)'}")
    return not ok


def field_microbench(count: int = 10_000) -> None:
    """Reference parity: the 10,000-element batch add/mul/square microbench
    (complete_bulletproof_test.cu:257-299)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from .ops import field as F, pallas_field as PF

    print(f"=== Batch field-op microbenchmarks ({count} elements) ===")
    rng = np.random.RandomState(7)
    a = jnp.asarray(rng.randint(0, F.MASK + 1, size=(count, F.L), dtype=np.int32))
    b = jnp.asarray(rng.randint(0, F.MASK + 1, size=(count, F.L), dtype=np.int32))
    for name, fn, args in [("add", PF.add, (a, b)), ("mul", PF.mul, (a, b)),
                           ("square", PF.sq, (a,))]:
        jax.block_until_ready(fn(*args))       # compile outside the timing
        _, t = _timed(lambda: jax.block_until_ready(fn(*args)))
        print(f"Batch field {name:6s}: {t:.6f} s  ({count / t:,.0f} op/s)")


def _setup_compile_cache():
    """Opt-in persistent XLA compile cache (BP_COMPILE_CACHE=<dir>).

    Off by default: with the tunneled TPU backend here, executable
    serialization through the cache measurably SLOWS first-call compiles
    (~211 s vs ~100 s for the 16-bit prover) and never hits cross-process.
    On a directly-attached TPU or CPU it behaves normally — opt in there."""
    import os
    path = os.environ.get("BP_COMPILE_CACHE", "")
    if not path:
        return
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def main(argv=None) -> int:
    import os

    from . import config

    # BP_PLATFORM=cpu forces the CPU backend (the axon TPU plugin overrides
    # JAX_PLATFORMS from the environment, so this must go through jax.config
    # before the backend initializes — e.g. when the TPU tunnel is down)
    if os.environ.get("BP_PLATFORM"):
        import jax
        jax.config.update("jax_platforms", os.environ["BP_PLATFORM"])

    _setup_compile_cache()
    ap = argparse.ArgumentParser(prog="cudabulletproof_tpu",
                                 description=__doc__.splitlines()[0])
    ap.add_argument("--benchmark", action="store_true",
                    help="run the full benchmark suite (benchmarks/bench_msm.py)")
    ap.add_argument("--range-bits", type=int, default=config.DEFAULT_RANGE_BITS)
    ap.add_argument("--value", type=int, default=42)
    ap.add_argument("--skip-microbench", action="store_true")
    args = ap.parse_args(argv)

    if args.benchmark:
        import pathlib
        import runpy
        bench = pathlib.Path(__file__).resolve().parents[1] / "benchmarks" / "bench_msm.py"
        sys.argv = [str(bench)]
        runpy.run_path(str(bench), run_name="__main__")
        return 0

    ok = positive_test(args.range_bits, args.value)
    ok = negative_test(args.range_bits) and ok
    if not args.skip_microbench:
        field_microbench()
    print(json.dumps({"all_tests": "SUCCESS" if ok else "FAILED"}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
