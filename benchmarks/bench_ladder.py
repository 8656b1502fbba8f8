"""A/B the Pallas scalarmult kernels (binary vs windowed) on hardware.

Chains k dependent ladder tiles inside one jit (the tunnel's ~38 ms dispatch
floor swamps single calls) and prints per-tile ms for each kernel.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cudabulletproof_tpu import config
from cudabulletproof_tpu.ops import curve as C, field as F
from cudabulletproof_tpu.models.generators import get_generators
from cudabulletproof_tpu.utils import scalars as S


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    gens = get_generators(64)
    pts = C.GE(*(c[:128] for c in gens.G))
    fl = F.from_ints([(7 * i + 3) % S.ELL for i in range(128)])

    def run_for(window):
        config.PALLAS_LADDER_WINDOW = window
        jax.clear_caches()
        from cudabulletproof_tpu.ops import pallas_curve as PC

        @jax.jit
        def chained(s):
            def body(i, s):
                out = PC.scalarmult_raw(pts, s)
                # feed x-limbs back in (masked to keep scalars < 2^253)
                return (s + (out.x & 1)) & F.MASK
            return jax.lax.fori_loop(0, k, body, s)

        jax.block_until_ready(chained(fl))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(chained(fl))
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    base = run_for(0)
    win = run_for(4)
    print(json.dumps({
        "k": k,
        "binary_ladder_ms_per_tile": round(base / k * 1e3, 3),
        "windowed_ladder_ms_per_tile": round(win / k * 1e3, 3),
        "speedup": round(base / win, 3)}))


if __name__ == "__main__":
    main()
