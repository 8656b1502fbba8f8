"""Multi-chip MSM: points sharded over the mesh, one collective at the end.

Decomposition: MSM is a sum over points, so shard the points (the "data
parallel" axis of this workload — SURVEY.md §2.7's DP analog).  Each chip runs
the full local bucket-method MSM over its shard; the per-chip partial results
(single points, ~3 KB) are all_gather'd over ICI and tree-reduced redundantly
on every chip.  Communication is O(n_devices) points regardless of n, so
scaling efficiency at large n is bucket-work-bound (target >=80% at 2^20 on
2 hosts, BASELINE.md).

Note on collectives: curve addition is a custom monoid, so `psum` (which sums
int lanes) cannot combine partial *points*; all_gather + local fold is the
correct XLA-native reduction here and costs one tiny collective.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import curve as C, field as F, msm as M, pippenger


def _local_then_gather(points: C.GE, scalars: jax.Array, axis: str, w: int):
    if w > 0:
        local = pippenger.msm_pippenger(points, scalars, w=w)
    else:
        local = M.msm(points, scalars)
    gathered = jax.lax.all_gather(local, axis)     # GE [ndev]
    return C.tree_reduce(gathered)


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "w"))
def msm_sharded(points: C.GE, scalars: jax.Array, *, mesh: Mesh,
                axis: str = "dp", w: int = 8) -> C.GE:
    """Sharded MSM over `mesh`. n must be divisible by the axis size.

    points: GE [n] / scalars [n, 20], arbitrary placement (resharded here).
    Returns a replicated GE.
    """
    fn = shard_map(
        functools.partial(_local_then_gather, axis=axis, w=w),
        mesh=mesh,
        in_specs=(C.GE(P(axis, None), P(axis, None), P(axis, None), P(axis, None)),
                  P(axis, None)),
        out_specs=C.GE(P(None), P(None), P(None), P(None)),
        # the result IS replicated (all_gather + identical local fold on every
        # device), but VMA inference can't see through the gathered fold
        check_vma=False,
    )
    return fn(points, scalars)
