"""Roofline model + profiling helpers for the field/MSM kernels.

BASELINE.md: 'Every field mul/square/reduce Pallas kernel profiled against a
speed-of-light limb-multiply roofline per chip.'

Model: one fe25519 multiply in the 20x13-bit radix costs
  * 400 int32 multiplies + 400 int32 adds (20x20 convolution)
  * ~40 fold ops (lo/hi split, two scaled adds over 19 coeffs)
  * 5 carry-relaxation passes x ~4 ops x 20 limbs = ~400 ops
  => ~1240 int32 VPU lane-ops per field multiply ('ops' = one elementwise
     int32 operation per lane).

Speed of light per chip = vpu_int32_lanes_per_sec / ops_per_mul.  The VPU
rate is taken from the chip's published vector throughput; for TPU v5e we use
8x128 lanes x 4 ALUs x 0.94 GHz ~= 3.85e12 int32 lane-ops/s (int multiplies
may occupy more than one ALU slot, so this is an upper bound — a true
'speed of light').

HBM bound: a streaming binary field op moves 3 x 80 B per element; at
~810 GB/s (v5e) that caps ~3.4e9 elem/s — far above the compute bound for
mul, so field multiplication is compute-bound (good: the MXU/VPU, not HBM,
set the ceiling).
"""
from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass

import jax

# per-chip VPU int32 lane-op rates (upper bounds)
VPU_RATES = {
    "TPU v5 lite": 3.85e12,
    "TPU v5e": 3.85e12,
    "TPU v5p": 7.4e12,
    "cpu": 2e11,
}

OPS_PER_FIELD_MUL = 1240
OPS_PER_FIELD_ADD = 180          # add + 2 relax passes
OPS_PER_CURVE_ADD = 9 * OPS_PER_FIELD_MUL + 7 * OPS_PER_FIELD_ADD


def chip_vpu_rate() -> float:
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", str(dev))
    for key, rate in VPU_RATES.items():
        if key.lower() in str(kind).lower():
            return rate
    return VPU_RATES["cpu"] if jax.default_backend() == "cpu" else 3.85e12


@dataclass
class Roofline:
    name: str
    achieved_per_sec: float
    speed_of_light_per_sec: float

    @property
    def fraction(self) -> float:
        return self.achieved_per_sec / self.speed_of_light_per_sec

    def to_json(self) -> str:
        return json.dumps({
            "roofline": self.name,
            "achieved_per_sec": round(self.achieved_per_sec, 1),
            "speed_of_light_per_sec": round(self.speed_of_light_per_sec, 1),
            "fraction_of_sol": round(self.fraction, 4),
        })


def field_mul_roofline(achieved_muls_per_sec: float) -> Roofline:
    return Roofline("field_mul", achieved_muls_per_sec,
                    chip_vpu_rate() / OPS_PER_FIELD_MUL)


def msm_roofline(points_per_sec: float, n: int, w: int = 8) -> Roofline:
    """Pippenger cost model: ~(2n + 3*2^w) curve adds per window x
    ceil(253/w) windows, normalized per point."""
    windows = -(-253 // w)
    adds_per_point = windows * (2 * n + 3 * (1 << w)) / n
    sol = chip_vpu_rate() / (adds_per_point * OPS_PER_CURVE_ADD)
    return Roofline(f"msm_2e{n.bit_length()-1}", points_per_sec, sol)


@contextlib.contextmanager
def trace(dirname: str):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    jax.profiler.start_trace(dirname)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, iters=5):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
