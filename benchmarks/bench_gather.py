"""Characterize XLA:TPU row-gather cost vs row size / alignment.

The round-3 stage profile pinned ~60% of Pippenger window time on the
[n, 80]-int32 row gather (21 MB at ~7 GB/s effective).  Hypotheses:
  (a) per-index bound: cost ~ n, independent of row bytes
  (b) sector bound: 320 B rows straddle 512 B HBM sectors; padding rows to
      128 int32 (512 B, aligned) should help
Run: python benchmarks/bench_gather.py [n]
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
    key = jax.random.PRNGKey(0)
    order = jax.random.permutation(key, jnp.arange(n, dtype=jnp.int32))
    K = 10

    for rows in (8, 20, 40, 80, 96, 128, 160, 256):
        flat = jax.random.randint(key, (n, rows), 0, 8192, dtype=jnp.int32)

        @jax.jit
        def go(flat, order):
            acc = jnp.int32(0)
            o = order
            for i in range(K):
                g = flat[o]
                acc = acc + jnp.sum(g)
                o = (o + acc % 3 + 1) % n       # serialize iterations
            return acc

        jax.block_until_ready(go(flat, order))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(go(flat, order))
            ts.append(time.perf_counter() - t0)
        t = statistics.median(ts) / K
        mb = n * rows * 4 / 1e6
        print(f"rows={rows:4d} ({rows*4:5d} B): {t*1e3:7.3f} ms "
              f"({mb/t/1e3:6.1f} GB/s, {t/n*1e9:6.1f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
