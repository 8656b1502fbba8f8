"""Time argsort single vs batched over windows, and the digit gather.

One-off A/B driver for the Pippenger sort stage."""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, iters=10):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    n, nw = 1 << 16, 20
    key = jax.random.PRNGKey(0)
    d1 = jax.random.randint(key, (n,), 0, 1 << 13, dtype=jnp.int32)
    dw = jax.random.randint(key, (nw, n), 0, 1 << 13, dtype=jnp.int32)

    f1 = jax.jit(lambda d: jnp.argsort(d))
    fw = jax.jit(lambda d: jnp.argsort(d, axis=1))
    t1 = timed(lambda: f1(d1))
    tw = timed(lambda: fw(dw))
    print(json.dumps({"argsort_single_ms": round(t1 * 1e3, 3),
                      "argsort_batched20_ms": round(tw * 1e3, 3),
                      "batched_per_window_ms": round(tw / nw * 1e3, 3)}))

    # sort+gather of the 4 coords, single window vs batched windows
    coords = jax.random.randint(key, (n, 80), 0, 1 << 13, dtype=jnp.int32)
    g1 = jax.jit(lambda d, c: c[jnp.argsort(d)])
    gw = jax.jit(lambda d, c: c[jnp.argsort(d, axis=1)])   # [nw, n, 80]
    t1g = timed(lambda: g1(d1, coords), iters=5)
    twg = timed(lambda: gw(dw, coords), iters=5)
    print(json.dumps({"sortgather_single_ms": round(t1g * 1e3, 3),
                      "sortgather_batched20_ms": round(twg * 1e3, 3),
                      "batched_per_window_ms": round(twg / nw * 1e3, 3)}))


if __name__ == "__main__":
    main()
