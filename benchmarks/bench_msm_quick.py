"""Quick MSM-only benchmark (2^16, current config) — one JSON line.

Used for fast A/B of MSM implementation changes; the full suite is
bench_msm.py."""
import json
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
    from cudabulletproof_tpu.ops import curve as C, field as F, msm as M
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

    fn = lambda: jax.block_until_ready(msm_pippenger(pts, ks, w=w))
    fn()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    t = statistics.median(ts)
    print(json.dumps({"metric": "msm_points_per_sec_quick", "n": n, "w": w,
                      "vmap_windows": config.MSM_VMAP_WINDOWS,
                      "radix_sort": config.MSM_RADIX_SORT,
                      "chunked_scan": config.MSM_CHUNKED_SCAN,
                      "scan_lanes": config.MSM_SCAN_LANES,
                      "seconds": round(t, 4),
                      "value": round(n / t, 1), "unit": "points/s"}))


if __name__ == "__main__":
    main()
