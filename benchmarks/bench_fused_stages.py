"""Per-stage warm timings of the fused prove/verify building blocks on TPU.

Methodology (NOTES.md): the tunnel has a ~30 ms sync floor, so each stage is
CHAINED k times inside one jitted fori_loop and the per-iteration time is
(t_chained - t_base) / k.  Prints one JSON line per stage.
"""
import functools
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cudabulletproof_tpu.ops import curve as C, field as F, scalar_field as SC
from cudabulletproof_tpu.ops import pallas_curve as PC
from cudabulletproof_tpu.models.device_transcript import DeviceTranscript
from cudabulletproof_tpu.models.generators import get_generators
from cudabulletproof_tpu.utils import scalars as S


def timed(fn, iters=7):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def chain(op, x0, k):
    """Time op chained k times (dependent) inside one jit."""
    @jax.jit
    def f(x):
        return jax.lax.fori_loop(0, k, lambda i, x: op(x), x)
    return timed(lambda: f(x0))


def report(name, ms):
    print(json.dumps({"stage": name, "ms": round(ms, 3)}), flush=True)


def main():
    k = 16
    # --- SC.invert (Fermat mod l), scalar and batched ---
    x = SC.from_int(123456789)
    t1 = chain(lambda v: SC.invert(v), x, k)
    t0 = chain(lambda v: v, x, k)
    report("sc_invert_single", (t1 - t0) / k * 1e3)

    xb = SC.from_ints(list(range(2, 10)))            # [8]
    t1 = chain(lambda v: SC.batch_invert(v) if hasattr(SC, "batch_invert")
               else SC.invert(v), xb, k)
    report("sc_invert_batch8", (t1 - t0) / k * 1e3)

    # --- SC.mul scalar (one conv) ---
    t1 = chain(lambda v: SC.mul(v, v), x, 256)
    report("sc_mul_single_x256", (t1 - t0 * 0) * 1e3)

    # --- Pallas ladder, one 256-lane tile ---
    gens = get_generators(16)
    pts = C.GE(*(jnp.concatenate([c, c], 0)[:34] for c in gens.G))
    fl = F.from_ints([(7 * i + 3) % S.ELL for i in range(34)])

    def lad(v):
        out = PC.scalarmult_raw(pts, v)
        return C.GE(*(c + 0 for c in out)).x[:, :] * 0 + v if False else v
    # chain by feeding ladder output x-limb back into scalars (keeps dep)
    @jax.jit
    def ladk(v):
        def body(i, v):
            out = PC.scalarmult_raw(pts, v)
            return (v + out.x.astype(jnp.int32) * 0 + out.y[:, :1] * 0)
        return jax.lax.fori_loop(0, 4, body, v)
    tl = timed(lambda: ladk(fl))
    report("pallas_ladder_tile34_x4_total", tl * 1e3)

    # --- transcript: 8 chained appends+challenges ---
    def tr_chain(seed):
        tr = DeviceTranscript(b"bench")
        tr.append(b"n", (16).to_bytes(4, "little"))
        st = seed
        for i in range(8):
            tr.append_point(b"P", st)
            ch = tr.challenge(b"BulletproofYChal")
            st = SC.to_bytes(ch[None])[0]
        return st
    seed = jnp.zeros((32,), jnp.uint8)
    f_tr = jax.jit(tr_chain)
    ttr = timed(lambda: f_tr(seed))
    report("transcript_8append_8challenge", ttr * 1e3)

    # --- from_bytes decompression of 13 points ---
    blobs = C.to_bytes_batch(C.GE(*(c[:13] for c in gens.G)))
    f_fb = jax.jit(lambda b: C.from_bytes(b)[0].x)
    tfb = timed(lambda: f_fb(blobs))
    report("from_bytes_13pts", tfb * 1e3)

    # --- SC.to_field_limbs + powers ---
    f_pw = jax.jit(lambda v: SC.powers(v, 16))
    tpw = timed(lambda: f_pw(x))
    report("sc_powers16", tpw * 1e3)

    # --- empty dispatch (sync floor) ---
    f_id = jax.jit(lambda v: v + 1)
    tid = timed(lambda: f_id(jnp.zeros((8,), jnp.int32)))
    report("sync_floor_empty_dispatch", tid * 1e3)


if __name__ == "__main__":
    main()
