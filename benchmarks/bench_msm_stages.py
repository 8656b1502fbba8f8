"""Stage-isolation timing of the Pippenger MSM (2^16, current window).

Sweeps the timing-only config flags (results are WRONG for the skip
configs — that is their purpose) in one process to get a fresh per-stage
cost map:
  full     — the real MSM
  skipsort — order = iota (no argsort compute; gather still happens)
  noscan   — sort + gather, no segmented scan (vals = p_sorted)
  nosuffix — sort + gather + scan, no bucket scatter/suffix fold

Run: python benchmarks/bench_msm_stages.py [n]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
    from cudabulletproof_tpu import config
    from cudabulletproof_tpu.ops import curve as C, field as F
    from cudabulletproof_tpu.ops.pippenger import msm_pippenger

    w = config.msm_window_for(n)
    base = C.base_point()
    idx = jnp.arange(1, n + 1, dtype=jnp.int32)
    sc_small = jnp.zeros((n, F.L), jnp.int32).at[:, 0].set(idx & F.MASK)
    sc_small = sc_small.at[:, 1].set(idx >> F.W)
    pts = C.scalarmult(C.GE(*(jnp.broadcast_to(c, (n, F.L)) for c in base)),
                       sc_small)
    ks = jnp.asarray(
        jnp.arange(n)[:, None] * 7919 % (F.MASK + 1)
    ).astype(jnp.int32) * jnp.ones((1, F.L), jnp.int32)

    def run(tag):
        fn = lambda: jax.block_until_ready(msm_pippenger(pts, ks, w=w))
        fn()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        t = statistics.median(ts)
        nw = -(-253 // w)
        print(f"{tag:10s} n={n} w={w}: {t*1e3:8.1f} ms total, "
              f"{t*1e3/nw:6.2f} ms/window, {n/t/1e3:7.1f} K pts/s",
              flush=True)
        return t

    import _stages
    # the taps target the sort+scan window body, not the accumulator kernel
    config.MSM_ACCUM_KERNEL = False

    which = sys.argv[2] if len(sys.argv) > 2 else "fallback"
    if which == "gathers":
        cfgs = [("gatherq", "gatherq", False), ("gatherh", "gatherh", False),
                ("gather0", "gather0", False), ("gatherw", "gatherw", False)]
    elif which == "chunked":
        # cumulative stages of the chunked-kernel path (round-3): each stops
        # the window body after the named stage and consumes its output
        cfgs = [("gather", "gather", False), ("scan", "scan", False),
                ("fixup", "fixup", False), ("scatter", "scatter", False),
                ("full", "", False)]
    else:
        cfgs = [("full", "", False), ("skipsort", "", True),
                ("noscan", "noscan", True), ("sortonly", "noscan", False)]
    try:
        for tag, stage, skip in cfgs:
            _stages.install(stage=stage, skip_sort=skip)
            run(tag)
    finally:
        _stages.uninstall()


if __name__ == "__main__":
    main()
