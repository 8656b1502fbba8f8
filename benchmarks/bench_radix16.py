"""A/B the EXPERIMENTAL radix-2^16 field mul against the shipped radix-2^13
kernel (round-4 NOTES.md ruling follow-up; round-5 verdict item 2).

Both sides run the same shape of work: a chained fori_loop of `reps`
dependent muls inside ONE Pallas dispatch on a [n]-element batch, so
dispatch and tunnel costs cancel and the number is pure kernel arithmetic.
Correctness is cross-checked against the python-int oracle before any
timing is printed (evidence-hygiene rule: no throughput line without a
passed check).

Run: python benchmarks/bench_radix16.py [n] [reps]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cudabulletproof_tpu.ops import field as F, pallas_field as PF, radix16 as R


def chain13(a, b, reps):
    """Matching chained-mul kernel at radix 2^13 (one dispatch)."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(a_ref, b_ref, o_ref):
        def body(_, x):
            return PF._conv_fold(x, b_ref[:, :])
        o_ref[:, :] = jax.lax.fori_loop(0, reps, body, a_ref[:, :])
    n = a.shape[0]
    nt = max(1, -(-n // PF.LANES))
    npad = nt * PF.LANES
    ins = [PF._pad_to(x, npad).T for x in (a, b)]
    out = pl.pallas_call(
        kern,
        out_shape=PF.sds((F.L, npad), jnp.int32, *ins),
        grid=(nt,),
        in_specs=[pl.BlockSpec((F.L, PF.LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((F.L, PF.LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=PF._interpret(),
    )(*ins)
    return out.T[:n]


def med(fn, iters=9):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    rng = np.random.default_rng(7)
    av = [int(rng.integers(0, 1 << 62)) | (1 << 200) for _ in range(4)]
    bv = [int(rng.integers(0, 1 << 62)) | (1 << 150) for _ in range(4)]

    # correctness gate (both radices, chained, vs python ints)
    a16 = jnp.asarray(np.stack([R.from_int(v) for v in av]))
    b16 = jnp.asarray(np.stack([R.from_int(v) for v in bv]))
    got16 = np.asarray(jax.jit(R.mul_chain, static_argnames="reps")(
        a16, b16, reps=3))
    a13 = F.from_ints(av)
    b13 = F.from_ints(bv)
    got13 = np.asarray(jax.jit(chain13, static_argnames="reps")(a13, b13, 3))
    for k in range(4):
        want = av[k]
        for _ in range(3):
            want = want * bv[k] % R.P_INT
        assert R.to_int(got16[k]) == want, f"radix16 chain wrong at {k}"
        assert F.to_int(got13[k]) % R.P_INT == want, \
            f"radix13 chain wrong at {k}"
    print(f"correctness ok (chained muls vs oracle); n={n} reps={reps} "
          f"backend={jax.default_backend()}", flush=True)

    A16 = jnp.asarray(rng.integers(0, 1 << 16, (n, R.L16), dtype=np.int32))
    B16 = jnp.asarray(rng.integers(0, 1 << 16, (n, R.L16), dtype=np.int32))
    A13 = jnp.asarray(rng.integers(0, 1 << 13, (n, F.L), dtype=np.int32))
    B13 = jnp.asarray(rng.integers(0, 1 << 13, (n, F.L), dtype=np.int32))
    jax.block_until_ready((A16, A13))

    f16 = jax.jit(R.mul_chain, static_argnames="reps")
    f13 = jax.jit(chain13, static_argnames="reps")
    t16 = med(lambda: f16(A16, B16, reps=reps))
    t13 = med(lambda: f13(A13, B13, reps=reps))
    r16 = n * reps / t16 / 1e9
    r13 = n * reps / t13 / 1e9
    print(f"radix13 20-limb mul: {t13*1e3:8.2f} ms  {r13:6.2f} G mul/s",
          flush=True)
    print(f"radix16 16-limb mul: {t16*1e3:8.2f} ms  {r16:6.2f} G mul/s  "
          f"({r16/r13:.2f}x radix13)", flush=True)


if __name__ == "__main__":
    main()
