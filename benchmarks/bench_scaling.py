"""MSM scaling-efficiency benchmark over a device mesh.

BASELINE.md target: >=80% MSM scaling efficiency at 2^20 points on a 2-host
v5p slice.  On real multi-chip hardware this measures it directly; on a
single chip it falls back to an 8-virtual-device CPU mesh
(--xla_force_host_platform_device_count) which validates the sharded program
structure and communication pattern, with the caveat that virtual devices
share one socket (efficiency numbers are then structural, not hardware).

Usage:
  python benchmarks/bench_scaling.py [--n 16384] [--devices 8] [--cpu]
"""
import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    # defaults are sized for REAL multi-chip hardware; on the CPU-mesh
    # fallback pass e.g. --n 512 --w 4 (XLA CPU compiles of the sharded
    # bucket program are minutes-per-config on small hosts)
    ap.add_argument("--n", type=int, default=1 << 16)
    ap.add_argument("--devices", type=int, default=0,
                    help="mesh size (default: all available)")
    ap.add_argument("--cpu", action="store_true",
                    help="force an 8-virtual-device CPU mesh")
    ap.add_argument("--w", type=int, default=8)
    ap.add_argument("--meshes", type=str, default="",
                    help="comma-separated mesh sizes (default 1,2,4,8)")
    args = ap.parse_args()

    import jax
    needs_cpu_mesh = args.cpu or len(jax.devices()) == 1
    on_cpu_mesh = (jax.default_backend() == "cpu" and len(jax.devices()) > 1)
    if needs_cpu_mesh and not on_cpu_mesh:
        # the backend is already initialized; re-exec with virtual CPU devices
        flags = os.environ.get("XLA_FLAGS", "")
        os.execvpe(sys.executable, [
            sys.executable, os.path.abspath(__file__),
            "--n", str(args.n), "--w", str(args.w), "--cpu",
            *(["--meshes", args.meshes] if args.meshes else []),
            *(["--devices", str(args.devices)] if args.devices else []),
        ], {**os.environ,
            "XLA_FLAGS": flags + " --xla_force_host_platform_device_count=8",
            "JAX_PLATFORMS": "cpu"})

    import jax.numpy as jnp
    from cudabulletproof_tpu.ops import curve as C, field as F
    from cudabulletproof_tpu.parallel import mesh as mesh_lib
    from cudabulletproof_tpu.parallel.sharded_msm import msm_sharded
    from cudabulletproof_tpu.utils import oracle

    ndev_all = len(jax.devices())
    nd = args.devices or ndev_all
    n = args.n
    print(json.dumps({"backend": jax.default_backend(), "devices": ndev_all,
                      "mesh": nd, "n": n}))

    base = C.from_oracle([oracle.BASE])
    ks = F.from_ints([(7 + i * 0xDEADBEEF12345) % oracle.ELL for i in range(n)])
    bb = C.GE(*(jnp.broadcast_to(c, (n,) + c.shape) for c in base))
    pts = C.scalarmult(bb, ks)
    jax.block_until_ready(pts.x)

    def timeit(fn, *a, iters=3):
        jax.block_until_ready(fn(*a))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    results = {}
    if args.meshes:
        sizes = [int(x) for x in args.meshes.split(",") if x]
    else:
        sizes = [d for d in (1, 2, 4, 8, nd) if d <= nd]
    for d in sorted(set(sizes)):
        mesh = mesh_lib.make_mesh(d)
        t = timeit(lambda p, s: msm_sharded(p, s, mesh=mesh, w=args.w), pts, ks)
        results[d] = t
        eff = results[1] / (t * d) if 1 in results else float("nan")
        print(json.dumps({"metric": "msm_sharded_time", "mesh": d,
                          "seconds": round(t, 4),
                          "points_per_sec": round(n / t, 1),
                          "scaling_efficiency": round(eff, 4)}))


if __name__ == "__main__":
    main()
