"""Probe the accumulator-MSM (lanes, unroll) frontier below 256 lanes.

The round-5 path sweep (bench_msm_paths.py) found lanes=256 strictly beats
512/1024 at every size — the per-window in-kernel fold costs ~linear in
lanes while the stream rate IMPROVES at smaller tiles.  This probes whether
the trend continues to lanes=128 (the fold's floor: hc = min(lanes, 128))
and whether unroll can buy back per-step overhead.  Chained-dependent device
timing (floor cancels); every result cross-checked against the ladder MSM.

Run: python benchmarks/bench_accum_frontier.py [n] [w,lanes,unroll ...]
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from cudabulletproof_tpu.ops import curve as C, pippenger as PP
from cudabulletproof_tpu.ops import pallas_curve as PC
from benchmarks.bench_msm_paths import chained, make_points, timed


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
    cfgs = [tuple(int(x) for x in a.split(",")) for a in sys.argv[2:]] or [
        (5, 128, 4), (5, 128, 8), (5, 256, 8), (5, 256, 2), (4, 256, 4),
        (6, 128, 4)]
    pts, sc = make_points(n)
    jax.block_until_ready(pts.x)
    print(f"n={n} backend={jax.default_backend()}", flush=True)
    _, _, ref = timed(PC.msm, pts, sc)
    for (w, lanes, unroll) in cfgs:
        fn = functools.partial(PP._msm_accum, w=w, lanes=lanes, unroll=unroll)
        try:
            _, cold, out = timed(jax.jit(fn), pts, sc)
        except Exception as e:
            print(f"w={w} l={lanes} u={unroll}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
            continue
        ok = bool(C.eq(out, ref))
        assert ok, (w, lanes, unroll)
        d = chained(fn, pts, sc)
        print(f"w={w} l={lanes:4d} u={unroll}: {d*1e3:8.1f} ms device  "
              f"{n/d/1e3:8.1f} K pts/s  (cold {cold:.0f}s, eq={ok})",
              flush=True)


if __name__ == "__main__":
    main()
