"""Micro-bench the non-kernel glue of one Pippenger window on TPU.

Isolates, each as K chained iterations inside ONE jit (the tunnel's ~30 ms
sync floor makes single-op timings useless — NOTES.md):
  gather      flat[order_c]                      [depth, lanes, 80]
  gather_t    flat[order_c].transpose(0, 2, 1)   (what the kernel consumes)
  transpose   x.transpose(0, 2, 1) alone (21 MB relayout)
  scatter     buckets.at[idx_c].set(vals) per GE coordinate
  argsort     jnp.argsort(digits)

Run: python benchmarks/bench_msm_glue.py [n] [w]
"""
import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cudabulletproof_tpu import config
from cudabulletproof_tpu.ops import curve as C, field as F

K = 20


def bench(name, fn, *args):
    jfn = jax.jit(fn)
    out = jax.block_until_ready(jfn(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(jfn(*args))
        ts.append(time.perf_counter() - t0)
    t = statistics.median(ts) / K
    print(f"{name:10s}: {t*1e3:7.3f} ms/iter", flush=True)
    return t


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    nb = 1 << w
    lanes = min(config.MSM_SCAN_LANES, n)
    depth = n // lanes

    key = jax.random.PRNGKey(0)
    flat = jax.random.randint(key, (n, 80), 0, 8192, dtype=jnp.int32)
    digits = jax.random.randint(key, (n,), 0, nb, dtype=jnp.int32)
    order0 = jnp.argsort(digits)
    vals = jax.random.randint(key, (depth, lanes, 20), 0, 8192,
                              dtype=jnp.int32)
    idx0 = jax.random.randint(key, (depth, lanes), 0, nb + 1,
                              dtype=jnp.int32)
    xt = jax.random.randint(key, (depth, lanes, 80), 0, 8192,
                            dtype=jnp.int32)

    def chain(body):
        def fn(*args):
            acc = jnp.int32(0)
            out = None
            for i in range(K):
                out = body(jnp.int32(i), *args)
                acc = acc + out.ravel()[i]    # data-dep: no CSE/DCE
            return acc
        return fn

    bench("argsort", chain(lambda i, d: jnp.argsort(d + i)), digits)
    bench("gather", chain(
        lambda i, f, o: f[((o + i) % n).reshape(lanes, depth).T]),
        flat, order0)
    bench("gather_t", chain(
        lambda i, f, o: f[((o + i) % n).reshape(lanes, depth).T]
        .transpose(0, 2, 1)), flat, order0)
    bench("transpose", chain(
        lambda i, x: (x + i).transpose(0, 2, 1)), xt)
    bench("scatter", chain(
        lambda i, v, ix: jnp.zeros((nb + 1, 20), jnp.int32)
        .at[(ix + i) % (nb + 1)].set(v)), vals, idx0)


if __name__ == "__main__":
    main()
