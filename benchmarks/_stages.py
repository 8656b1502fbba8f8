"""Quarantined stage-isolation instrumentation for the Pippenger MSM.

The taps here short-circuit the MSM window body after a named stage and
return deliberately WRONG results whose only purpose is to keep the stage's
compute alive for timing (round-3 verdict item 7 moved them out of the
production module: ops/pippenger.py contains no wrong-result branches).

Usage (benchmarks only):

    from benchmarks import _stages
    _stages.install(stage="scan")       # or skip_sort=True, stage="noscan"..
    ...time msm_pippenger()...
    _stages.uninstall()

While installed, `pippenger._INSTRUMENTED_STAGE` is set and
`config.require_exact()` (called by every protocol entry point) refuses to
run, so instrumentation can never silently corrupt a proof.

Stages (cumulative through the chunked-kernel window body):
  gatherq/gatherh/gather0/gatherw — the [n,*] row gather at 80/160/320/512 B
  gather   — gather + transpose to the scan kernel's compute layout
  scan     — + the one-kernel segmented scan
  fixup    — + cross-chunk carry application
  scatter  — + bucket scatter
Fallback-path stages: noscan (sort+gather only), nosuffix (no weighted
fold).  skip_sort=True replaces the argsort with iota.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from cudabulletproof_tpu.ops import curve as C
from cudabulletproof_tpu.ops import pippenger as PP


def _fake_ge(consumed: jax.Array) -> C.GE:
    """A GE carrying a data dependence on `consumed` (an int32 scalar, e.g.
    a sum of a stage's output) so XLA cannot DCE the stage, while everything
    downstream stays trivially cheap.  WRONG results by design."""
    one = C.identity(())
    return C.GE(one.x + consumed, one.y, one.z, one.t)


_CHUNKED_STAGES = ("gather0", "gather", "scan", "fixup", "scatter",
                   "gatherh", "gatherq", "gatherw")
_ORIG = PP._bucket_window


def _instrumented_bucket_window(stage: str, skip_sort: bool):
    from cudabulletproof_tpu import config

    def _bucket_window(flat, digits, w):
        n = digits.shape[0]
        nb = 1 << w
        order = (jnp.arange(n, dtype=jnp.int32) if skip_sort
                 else PP._digit_order(digits, w))
        lanes = min(config.MSM_SCAN_LANES, n)
        chunked = (config.MSM_CHUNKED_SCAN and n % lanes == 0
                   and n >= 2 * lanes)
        if chunked and stage in _CHUNKED_STAGES:
            return _chunked_taps(flat, digits, order, w, stage)
        if chunked and not stage:
            return PP._bucket_window_chunked(flat, digits, order, w)
        d_sorted = digits[order]
        p_sorted = PP._unflat(flat[order])
        head = jnp.concatenate([jnp.ones((1,), bool),
                                d_sorted[1:] != d_sorted[:-1]])
        if stage == "noscan":
            vals = p_sorted
        elif chunked:
            vals = PP._chunked_seg_scan(p_sorted, head)
        else:
            vals, _ = jax.lax.associative_scan(
                PP._seg_combine, (p_sorted, head), axis=0)
        if stage == "nosuffix":
            return C.GE(*(c[0] for c in vals))
        tail = jnp.concatenate([head[1:], jnp.ones((1,), bool)])
        idx = jnp.where(tail, d_sorted, nb)
        buckets = C.identity((nb + 1,))
        buckets = C.GE(*(bc.at[idx].set(vc)
                         for bc, vc in zip(buckets, vals)))
        return PP._bucket_suffix_fold(buckets, nb)

    return _bucket_window


def _chunked_taps(flat, digits, order, w, stage):
    """Cumulative-stage taps through the chunked one-kernel window body
    (mirrors pippenger._bucket_window_chunked up to the requested stage)."""
    from cudabulletproof_tpu import config
    from cudabulletproof_tpu.ops import pallas_curve as PC
    n = digits.shape[0]
    nb = 1 << w
    lanes = min(config.MSM_SCAN_LANES, n)
    depth = n // lanes
    d_sorted = digits[order]
    head = jnp.concatenate([jnp.ones((1,), bool),
                            d_sorted[1:] != d_sorted[:-1]])
    order_c = order.reshape(lanes, depth).T
    hc = head.reshape(lanes, depth).T
    if stage == "gatherq":
        return _fake_ge(jnp.sum(flat[:, :20][order_c]))    # 80 B rows
    if stage == "gatherh":
        return _fake_ge(jnp.sum(flat[:, :40][order_c]))    # 160 B rows
    if stage == "gatherw":
        fpad = jnp.pad(flat, ((0, 0), (0, 48)))            # 512 B aligned
        return _fake_ge(jnp.sum(fpad[order_c]))
    raw = flat[order_c]
    if stage == "gather0":
        return _fake_ge(jnp.sum(raw))
    pt = raw.transpose(0, 2, 1)
    if stage == "gather":
        return _fake_ge(jnp.sum(pt))
    ht = hc[:, None, :].astype(jnp.int32)
    outs_t, carry_t = PC.seg_scan(pt, ht)
    if stage == "scan":
        return _fake_ge(jnp.sum(outs_t) + jnp.sum(carry_t))
    outs = PP._unflat(outs_t.transpose(0, 2, 1))
    carry = PP._unflat(carry_t.T)
    hmat = head.reshape(lanes, depth)
    headfirst = hmat[:, 0]
    tail = jnp.concatenate([head[1:], jnp.ones((1,), bool)])
    tmat = tail.reshape(lanes, depth)
    has_tail = tmat.any(axis=1)
    first_tail = jnp.argmax(tmat, axis=1)
    lane_ids = jnp.arange(lanes)
    apply = (lane_ids > 0) & (~headfirst) & has_tail
    tgt = C.GE(*(c[first_tail, lane_ids] for c in outs))
    fixed = C.select(apply, C.add(tgt, carry), tgt)
    outs = C.GE(*(c.at[first_tail, lane_ids].set(fc)
                  for c, fc in zip(outs, fixed)))
    if stage == "fixup":
        return _fake_ge(sum(jnp.sum(c) for c in outs))
    idx_c = jnp.where(tmat, d_sorted.reshape(lanes, depth), nb).T
    buckets = C.identity((nb + 1,))
    buckets = C.GE(*(bc.at[idx_c].set(vc) for bc, vc in zip(buckets, outs)))
    assert stage == "scatter", stage
    return _fake_ge(sum(jnp.sum(c) for c in buckets))


def install(stage: str = "", skip_sort: bool = False) -> None:
    """Monkeypatch the MSM window body with the requested stage tap.
    Marks the module so config.require_exact() refuses protocol code."""
    PP._bucket_window = _instrumented_bucket_window(stage, skip_sort)
    PP._INSTRUMENTED_STAGE = stage or ("skipsort" if skip_sort else "full")
    jax.clear_caches()


def uninstall() -> None:
    PP._bucket_window = _ORIG
    PP._INSTRUMENTED_STAGE = None
    jax.clear_caches()
