"""On-TPU correctness check of the Pippenger kernel path vs the host oracle.

The interpret-mode pytest suite proves kernel SEMANTICS; this proves the
Mosaic-lowered kernels (seg_scan with in-kernel carries, bucket_fold) compute
the same thing on hardware, at a size that exercises the chunked layout,
multi-chunk segments, and front-padded folds.

Run: python benchmarks/check_msm_tpu.py [n] [w]
     python benchmarks/check_msm_tpu.py --sharded [n]
       (MOSAIC-lowered accumulator kernel under shard_map with strict
        check_vma=True on the real chip — typing validation the interpret
        suite cannot do, see config.SHARD_CHECK_VMA)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from cudabulletproof_tpu.ops import curve as C, field as F
from cudabulletproof_tpu.ops.pippenger import msm_pippenger
from cudabulletproof_tpu.utils import oracle


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--sharded":
        from jax.sharding import Mesh
        from cudabulletproof_tpu import config
        from cudabulletproof_tpu.parallel.sharded_msm import msm_sharded
        assert config.SHARD_CHECK_VMA, "strict typing must be on"
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
        mesh = Mesh(jax.devices()[:1], ("dp",))
        pts = [oracle.hash_to_point(b"msmchk", i) for i in range(n)]
        sc = [(i * 0x9E3779B97F4A7C15 + 0xBEEF) % oracle.ELL
              for i in range(n)]
        got = C.to_oracle(msm_sharded(
            C.from_oracle(pts), F.from_ints(sc), mesh=mesh))[0]
        want = oracle.IDENTITY
        for p, s in zip(pts, sc):
            want = want + s * p
        assert got == want, "sharded accum MSM mismatch vs oracle"
        print(f"MSM-TPU-SHARDED-OK n={n} check_vma=True "
              f"backend={jax.default_backend()}")
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    rng_mult = 0x9E3779B97F4A7C15
    pts = [oracle.hash_to_point(b"msmchk", i) for i in range(n)]
    sc = [(i * rng_mult + 0xBEEF) % oracle.ELL for i in range(n)]
    got = C.to_oracle(msm_pippenger(
        C.from_oracle(pts), F.from_ints(sc), w=w))[0]
    want = oracle.IDENTITY
    for p, s in zip(pts, sc):
        want = want + s * p
    assert got == want, "TPU Pippenger mismatch vs oracle"
    print(f"MSM-TPU-OK n={n} w={w} backend={jax.default_backend()}")


if __name__ == "__main__":
    main()
