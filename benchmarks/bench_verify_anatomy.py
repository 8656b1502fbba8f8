"""Bisect the fused single-proof verify's per-dispatch wall (round-5 work on
round-4 verdict weak #4).

Round-5 findings this harness extends (see NOTES.md "dispatch overhead"):
  * there is NO fixed tunnel floor — a trivial program syncs in 0.02 ms in a
    fresh session, ~24 ms after any big program has run (session state flip
    in the tunnel's wait path);
  * the n=16 fused verify costs ~46 ms PER DISPATCH (async marginal) with
    device-resident args — not transfer, not sync;
  * every component measured standalone (invert chains, sha256, MSM) is
    <0.1 ms, so the cost hides in the COMPOSED program.

This harness times cumulative slices of the verify body as separate jitted
programs (fresh args each call; measured smallest-first so the session flip
does not bias earlier rows): challenges-only -> +fold scalars -> +RLC
scalars (full parts) -> +MSM (full verify).  The marginal between rows
attributes the wall.  Run on TPU: python benchmarks/bench_verify_anatomy.py
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cudabulletproof_tpu.models import fused
from cudabulletproof_tpu.models.generators import get_generators
from cudabulletproof_tpu.models.device_transcript import DeviceTranscript
from cudabulletproof_tpu.models.rangeproof import (DOMAIN_Q, DOMAIN_X,
                                                   DOMAIN_Y, DOMAIN_Z)
from cudabulletproof_tpu.ops import curve as C, scalar_field as SC
from cudabulletproof_tpu.utils import native, serialization


def medw(fn, iters=9):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3


def main():
    n = 16
    k = n.bit_length() - 1
    npts = 5 + 2 * k
    gens = get_generators(n)
    blob_bytes = native.prove_range(42, 424242, n)
    proof = serialization.deserialize_range_proof(blob_bytes)
    blob = jnp.asarray(fused._proof_blob(proof))
    rnd = SC.from_ints([3, 5])
    gp = fused._gens_pack(gens, n)
    jax.block_until_ready((blob, rnd, gp))

    def challenges(blob, rnd, gp):
        """Transcript slice: decompress, absorb, derive all 13 challenges."""
        pts_bytes = blob[:npts * 32].reshape(npts, 32)
        sc5 = SC.from_bytes(blob[npts * 32:].reshape(5, 32))
        taux, mu, t_hat, a_sc, b_sc = (sc5[i] for i in range(5))
        pts, valid = C.from_bytes(pts_bytes)
        valid = jnp.logical_and(valid, ~C.is_small_order(pts))
        tr = DeviceTranscript(b"tpu-bulletproofs/range")
        tr.append(b"n", n.to_bytes(4, "little"))
        tr.append_point(b"V", pts_bytes[0])
        tr.append_point(b"A", pts_bytes[1])
        tr.append_point(b"S", pts_bytes[2])
        y = tr.challenge(DOMAIN_Y)
        z = tr.challenge(DOMAIN_Z)
        tr.append_point(b"T1", pts_bytes[3])
        tr.append_point(b"T2", pts_bytes[4])
        x = tr.challenge(DOMAIN_X)
        tr.append_scalar(b"taux", taux)
        tr.append_scalar(b"mu", mu)
        tr.append_scalar(b"t", t_hat)
        w = tr.challenge(DOMAIN_Q)
        us = []
        for j in range(k):
            tr.append_point(b"ipL", pts_bytes[5 + j])
            tr.append_point(b"ipR", pts_bytes[5 + k + j])
            us.append(tr.challenge(fused.IPA_DOMAIN))
        return valid, y, z, x, w, jnp.stack(us), taux

    def decompress_only(blob, rnd, gp):
        pts_bytes = blob[:npts * 32].reshape(npts, 32)
        pts, valid = C.from_bytes(pts_bytes)
        return valid, pts.x

    def fold(blob, rnd, gp):
        valid, y, z, x, w, us, taux = challenges(blob, rnd, gp)
        bit_tab = np.zeros((k, n), dtype=bool)
        for j in range(k):
            bit_tab[j] = (np.arange(n) >> (k - 1 - j)) & 1
        s = SC.ones((n,))
        for j in range(k):
            u_inv = SC.invert(us[j])
            pick = jnp.where(jnp.asarray(bit_tab[j])[:, None],
                             us[j][None], u_inv[None])
            s = SC.mul(s, pick)
        return valid, s, SC.powers(y, n)

    parts = fused._verify_parts_fn(n)
    jfn, _ = fused._verify_fn(n)

    rows = [
        ("decompress_only", jax.jit(decompress_only)),
        ("challenges", jax.jit(challenges)),
        ("challenges+fold", jax.jit(fold)),
        ("full_parts", jax.jit(parts)),
        ("full_verify", jfn),
    ]
    for name, fn in rows:
        hlo = fn.lower(blob, rnd, gp).compile().as_text()
        nfus = hlo.count("fusion(")
        ms = medw(lambda fn=fn: fn(blob, rnd, gp))
        print(f"{name:18s} {ms:7.2f} ms wall   {nfus:5d} static fusions",
              flush=True)


if __name__ == "__main__":
    main()
