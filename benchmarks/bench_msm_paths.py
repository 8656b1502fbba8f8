"""Multi-size crossover sweep: ladder vs accumulator(w,lanes) vs sort+scan.

The round-4 default config routed fused-program MSMs >= 2048 bases to the
accumulator kernel on a cost-model EXTRAPOLATION, and the one committed
measurement of that config (check_fused_agg_tpu_n64m64_accum_r4.txt) showed
it 26% SLOWER at N=4096 than the ladder routing.  This sweep measures the
real standalone cost of each path at the sizes fused programs actually see
(2K..128K bases), including small-lane accumulator configs (the per-window
in-kernel fold is a FIXED cost ~ lanes, so small MSMs want small lanes), and
is the calibration source for config._accum_cost_ns / msm_accum_plan.

Throughput lines print ONLY for results that passed a cross-check against
the ladder path (computed per size; the ladder is oracle-validated in
tests).

Run: python benchmarks/bench_msm_paths.py [n1 n2 ...]
  default sizes: 2048 4096 8192 16384 32768 65536 131072
"""
import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import hashlib

import jax
import jax.numpy as jnp

from cudabulletproof_tpu import config
from cudabulletproof_tpu.ops import curve as C, field as F, pippenger as PP
from cudabulletproof_tpu.ops import pallas_curve as PC
from cudabulletproof_tpu.utils import oracle


def make_points(n, seed=7):
    base = C.base_point()
    idx = [(seed + i * 0x9E3779B97F4A7C15) % oracle.ELL for i in range(n)]
    chunks = []
    step = min(n, 1 << 16)
    for off in range(0, n, step):
        sub = C.GE(*(jnp.broadcast_to(c, (step, F.L)) for c in base))
        chunks.append(C.scalarmult(sub, F.from_ints(idx[off:off + step])))
    pts = C.GE(*(jnp.concatenate([ch[i] for ch in chunks]) for i in range(4)))
    sc = [int.from_bytes(hashlib.sha256(b"paths%d" % i).digest(), "little")
          % oracle.ELL for i in range(n)]
    return pts, F.from_ints(sc)


def timed(fn, *args):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    cold = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t1 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t1)
    return statistics.median(ts), cold, out


CHAIN_K = int(os.environ.get("BP_PATHS_CHAIN", "8"))


def chained(msm_fn, pts, sc, k=None):
    """DEVICE time per MSM: k dependent MSMs in ONE dispatch (the ~30 ms
    tunnel floor swamps single-call walls below ~2^16 — the early round-5
    sweep measured a 2048-point accum MSM at 27.6 ms wall vs ~4 ms device).
    Each iteration XORs a value derived from the previous result into the
    scalars' low limb (keeps limbs < 2^13, changes every digit), so the
    compiler can neither CSE nor reorder the chain.  Returns the marginal
    per-MSM ms: (T_k - T_1) / (k - 1)."""
    k = k or CHAIN_K

    def make(k):
        @jax.jit
        def f(pts, sc):
            def body(i, carry):
                pert = (carry.x[0] & 1023) ^ i
                sc_i = sc.at[:, 0].set(sc[:, 0] ^ pert)
                # data-dependent point rotation keeps the per-MSM precompute
                # (madd_precomp's batch inversion) inside the loop — it is
                # loop-invariant otherwise and XLA would hoist it, which the
                # in-fused reality (fresh bases per MSM) does not allow
                pts_i = C.GE(*(jnp.roll(c, pert & 1, axis=0) for c in pts))
                return msm_fn(pts_i, sc_i)
            init = C.identity_like(C.GE(*(c[0] for c in pts)))
            return jax.lax.fori_loop(0, k, body, init)
        return f
    t1, _, _ = timed(make(1), pts, sc)
    tk, _, _ = timed(make(k), pts, sc)
    return (tk - t1) / (k - 1)


def main():
    sizes = ([int(a) for a in sys.argv[1:]] or
             [2048, 4096, 8192, 16384, 32768, 65536, 131072])
    print(f"backend={jax.default_backend()}", flush=True)
    for n in sizes:
        pts, sc = make_points(n)
        jax.block_until_ready(pts.x)
        rows = []

        # ladder: flat ~8.6 us/pt — the fused programs' alternative path
        t_lad, cold, ref = timed(PC.msm, pts, sc)
        d_lad = chained(PC.msm, pts, sc)
        print(f"n={n:7d} ladder:                 {t_lad*1e3:8.1f} ms wall / "
              f"{d_lad*1e3:8.1f} ms device  {n/d_lad/1e3:8.1f} K pts/s  "
              f"(cold {cold:.1f}s) [anchor]", flush=True)

        # accumulator at the plan's (w, lanes) + a small grid around it
        pw, pl_, pu = config.msm_accum_plan(n)
        grid = {(pw, pl_, pu)}
        for lanes in (256, 1024):
            grid.add((pw, lanes, pu))
        grid.add((min(8, pw + 1), pl_, pu))
        for (w, lanes, unroll) in sorted(grid):
            fn = jax.jit(functools.partial(
                PP._msm_accum, w=w, lanes=lanes, unroll=unroll))
            try:
                t, cold, out = timed(fn, pts, sc)
            except Exception as e:
                print(f"n={n:7d} accum w={w} l={lanes} u={unroll}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
                continue
            ok = bool(C.eq(out, ref))
            assert ok, (n, w, lanes, unroll)
            d = chained(functools.partial(
                PP._msm_accum, w=w, lanes=lanes, unroll=unroll), pts, sc)
            star = " <-plan" if (w, lanes, unroll) == (pw, pl_, pu) else ""
            pred = config._accum_cost_ns(n, w, lanes, unroll) / 1e6
            print(f"n={n:7d} accum w={w} l={lanes:4d} u={unroll}: "
                  f"{t*1e3:8.1f} ms wall / {d*1e3:8.1f} ms device  "
                  f"{n/d/1e3:8.1f} K pts/s  "
                  f"(model {pred:6.1f} ms, cold {cold:.0f}s, eq={ok}){star}",
                  flush=True)
            rows.append((d, w, lanes, unroll))

        if os.environ.get("BP_PATHS_SCAN", "0") != "0":
            w_s = config.msm_window_for(n)
            t, cold, out = timed(
                functools.partial(PP.msm_pippenger, w=w_s), pts, sc)
            ok = bool(C.eq(out, ref))
            assert ok, (n, "scan")
            print(f"n={n:7d} scan w={w_s}:             {t*1e3:8.1f} ms  "
                  f"{n/t/1e3:8.1f} K pts/s  (cold {cold:.0f}s, eq={ok})",
                  flush=True)

        if rows:
            d, w, lanes, unroll = min(rows)
            verdict = "accum wins" if d < d_lad else "LADDER wins"
            print(f"n={n:7d} BEST accum (device): w={w} l={lanes} u={unroll} "
                  f"{d*1e3:.1f} ms vs ladder {d_lad*1e3:.1f} ms -> {verdict}",
                  flush=True)


if __name__ == "__main__":
    main()
