"""Pallas point-kernel bit-exactness vs the XLA curve path (interpret mode on
CPU; compiled on TPU). Mirrors SURVEY.md §4's kernel-vs-reference strategy."""
import jax.numpy as jnp

from cudabulletproof_tpu.ops import curve as C, field as F, msm as M, pallas_curve as PC
from cudabulletproof_tpu.utils import oracle, scalars as S


def _points(label, n):
    return C.from_oracle([oracle.hash_to_point(label, i) for i in range(n)])


def test_pallas_add_matches_curve(rng):
    n = 8
    p = _points(b"pca", n)
    q = _points(b"pcb", n)
    assert bool(jnp.all(C.eq(PC.add(p, q), C.add(p, q))))


def test_pallas_add_identity_and_double(rng):
    n = 4
    p = _points(b"pcc", n)
    idn = C.identity((n,))
    assert bool(jnp.all(C.eq(PC.add(p, idn), p)))
    assert bool(jnp.all(C.eq(PC.double(p), C.double(p))))


def test_pallas_ladder_matches_curve(rng):
    n = 4
    p = _points(b"pcd", n)
    sc = [rng.randrange(S.ELL) for _ in range(n)]
    s = F.from_ints(sc)
    got = PC.scalarmult(p, s)
    want = C.scalarmult(p, s)
    assert bool(jnp.all(C.eq(got, want)))


def test_pallas_ladder_edge_scalars():
    p = _points(b"pce", 4)
    s = F.from_ints([0, 1, 2, S.ELL - 1])
    assert bool(jnp.all(C.eq(PC.scalarmult(p, s), C.scalarmult(p, s))))


def test_pallas_tree_reduce(rng):
    n = 13   # non-power-of-two
    p = _points(b"pcf", n)
    assert bool(C.eq(PC.tree_reduce(p), C.tree_reduce(p)))


def test_pallas_msm_matches_oracle(rng):
    n = 6
    pts = [oracle.hash_to_point(b"pcg", i) for i in range(n)]
    sc = [rng.randrange(S.ELL) for _ in range(n)]
    got = C.to_oracle(PC.msm(C.from_oracle(pts), F.from_ints(sc)))[0]
    want = oracle.IDENTITY
    for pt, s in zip(pts, sc):
        want = want + s * pt
    assert got == want


def test_both_ladder_kernels_match_oracle(rng, monkeypatch):
    """Pin the windowed (w=4) AND binary ladder kernels independently against
    the python-int oracle (config.PALLAS_LADDER_WINDOW selects per trace)."""
    import jax
    from cudabulletproof_tpu import config
    n = 3
    pts = [oracle.hash_to_point(b"pclw", i) for i in range(n)]
    sc = [1, oracle.ELL - 1, rng.randrange(oracle.ELL)]
    want = [s * pt for pt, s in zip(pts, sc)]
    for win in (4, 0):
        monkeypatch.setattr(config, "PALLAS_LADDER_WINDOW", win)
        jax.clear_caches()   # kernel choice is baked in at trace time
        got = PC.scalarmult(C.from_oracle(pts), F.from_ints(sc))
        assert C.to_oracle(got) == want, f"window={win}"
    jax.clear_caches()


def test_pallas_seg_scan_matches_xla_full(rng, monkeypatch):
    """Unsegmented chunked scan: ONE-kernel Pallas path (interpret) vs the
    XLA lax.scan path, every position."""
    from cudabulletproof_tpu import config
    from cudabulletproof_tpu.ops import pippenger as PP
    n = 16
    p = _points(b"pss", n)
    monkeypatch.setattr(config, "MSM_SCAN_LANES", 4)
    monkeypatch.setattr(config, "MSM_PALLAS_SCAN_FORCE", False)
    monkeypatch.setattr(config, "MSM_PALLAS_SCAN", False)
    want = PP._chunked_scan_full(p)
    monkeypatch.setattr(config, "MSM_PALLAS_SCAN_FORCE", True)
    monkeypatch.setattr(config, "MSM_PALLAS_SCAN", True)
    got = PP._chunked_scan_full(p)
    assert bool(jnp.all(C.eq(got, want)))


def test_pallas_seg_scan_segments(rng, monkeypatch):
    """Segmented kernel semantics: heads reset the accumulator; non-head
    values equal the running segment sum (checked against eager C ops)."""
    import jax.numpy as jnp2
    from cudabulletproof_tpu.ops import pallas_curve as PC2
    depth, lanes = 4, 4
    n = depth * lanes
    p = _points(b"pst", n)
    heads = [1, 0, 0, 1] + [1, 1, 0, 0] + [0, 1, 0, 1] + [1, 0, 1, 0]
    # chunk layout: lane l owns elements [l*depth, (l+1)*depth)
    flat = jnp2.concatenate(list(p), axis=-1)
    pt = flat.reshape(lanes, depth, 80).transpose(1, 2, 0)
    hmat = jnp2.asarray(heads, jnp2.int32).reshape(lanes, depth).T
    got, carry_t = PC2.seg_scan(pt, hmat[:, None, :])
    # carry correctness: lane l's carry = segmented combine of trailing
    # values across lanes < l (exclusive), flags = lane-has-head
    trails, flags = [], []
    acc = None
    for l in range(lanes):
        for j in range(depth):
            i = l * depth + j
            row = C.GE(*(c[i] for c in p))
            acc = row if (j == 0 or heads[i]) else C.add(acc, row)
        trails.append(acc)
        flags.append(any(heads[l * depth:(l + 1) * depth]))
    want_carry = C.identity(())
    carry_ge = C.GE(carry_t.T[:, 0:20], carry_t.T[:, 20:40],
                    carry_t.T[:, 40:60], carry_t.T[:, 60:80])
    for l in range(lanes):
        assert bool(C.eq(C.GE(*(c[l] for c in carry_ge)), want_carry)), l
        if flags[l]:
            want_carry = trails[l]
        else:
            want_carry = C.add(want_carry, trails[l])
    got_flat = got.transpose(0, 2, 1).transpose(1, 0, 2).reshape(n, 80)
    got_ge = C.GE(got_flat[:, 0:20], got_flat[:, 20:40],
                  got_flat[:, 40:60], got_flat[:, 60:80])
    # reference: per-lane sequential segmented scan with eager curve adds
    acc = None
    for l in range(lanes):
        for j in range(depth):
            i = l * depth + j
            row = C.GE(*(c[i] for c in p))
            if j == 0 or heads[i]:
                acc = row
            else:
                acc = C.add(acc, row)
            gi = C.GE(*(c[i] for c in got_ge))
            # positions continuing a segment from a previous chunk don't
            # exist here (j==0 always restarts: kernel is chunk-local when
            # heads[l*depth]==0, which this fixture avoids for lanes > 0)
            if j == 0 and not heads[i] and l > 0:
                continue
            assert bool(C.eq(gi, acc)), (l, j)


def test_pallas_scan_kernel_msm(rng, monkeypatch):
    """Full bucket MSM through the one-kernel scan path vs the oracle."""
    from cudabulletproof_tpu import config
    from cudabulletproof_tpu.ops import pippenger as PP
    monkeypatch.setattr(config, "MSM_PALLAS_SCAN_FORCE", True)
    monkeypatch.setattr(config, "MSM_PALLAS_SCAN", True)
    monkeypatch.setattr(config, "MSM_SCAN_LANES", 8)
    n = 32
    pts = [oracle.hash_to_point(b"psk", i) for i in range(n)]
    sc = [rng.randrange(S.ELL) for _ in range(n)]
    got = C.to_oracle(PP.msm_pippenger(
        C.from_oracle(pts), F.from_ints(sc), w=5))[0]
    want = oracle.IDENTITY
    for pt, s in zip(pts, sc):
        want = want + s * pt
    assert got == want


def test_pallas_bucket_fold_matches_direct(rng):
    """bucket_fold (one-kernel weighted suffix fold) vs direct oracle
    computation of sum_p prefix(p), at depth>1 and with front padding."""
    for m, lanes in ((15, 4), (9, 4), (4, 4), (23, 8)):
        pts = [oracle.hash_to_point(b"pbf%d" % lanes, i) for i in range(m)]
        flat = jnp.concatenate(list(C.from_oracle(pts)), axis=-1)
        got_flat = PC.bucket_fold(flat, lanes=lanes)
        got = C.to_oracle(C.GE(got_flat[None, 0:20], got_flat[None, 20:40],
                               got_flat[None, 40:60], got_flat[None, 60:80]))[0]
        want = oracle.IDENTITY
        pre = oracle.IDENTITY
        for p in pts:
            pre = pre + p
            want = want + pre
        assert got == want, (m, lanes)


def test_pallas_bucket_fold_in_msm(rng, monkeypatch):
    """Full bucket MSM with BOTH one-kernel paths (scan + fold) forced on,
    vs the oracle (covers the _bucket_suffix_fold kernel routing)."""
    from cudabulletproof_tpu import config
    from cudabulletproof_tpu.ops import pippenger as PP
    monkeypatch.setattr(config, "MSM_PALLAS_SCAN_FORCE", True)
    monkeypatch.setattr(config, "MSM_PALLAS_SCAN", True)
    monkeypatch.setattr(config, "MSM_FOLD_KERNEL", True)
    monkeypatch.setattr(config, "MSM_SCAN_LANES", 8)
    n = 16
    pts = [oracle.hash_to_point(b"pbm", i) for i in range(n)]
    sc = [rng.randrange(S.ELL) for _ in range(n)]
    got = C.to_oracle(PP.msm_pippenger(
        C.from_oracle(pts), F.from_ints(sc), w=4))[0]
    want = oracle.IDENTITY
    for pt, s in zip(pts, sc):
        want = want + s * pt
    assert got == want


def test_pallas_bucket_accum_msm(rng, monkeypatch):
    """Zero-shuffle accumulator MSM (one-kernel windows, VMEM bucket
    accumulators) vs the oracle, with padding (n not a lane multiple).
    Calls the public msm_accum entry explicitly — msm_pippenger no longer
    reroutes to the accumulator (round-4 verdict: its `w` was silently
    ignored when the accum kernel hijacked the call)."""
    from cudabulletproof_tpu import config
    from cudabulletproof_tpu.ops import pippenger as PP
    monkeypatch.setattr(config, "MSM_PALLAS_SCAN_FORCE", True)
    for n in (32, 13):        # multiple + non-multiple of lanes*unroll
        pts = [oracle.hash_to_point(b"pba%d" % n, i) for i in range(n)]
        sc = [rng.randrange(S.ELL) for _ in range(n)]
        got = C.to_oracle(PP.msm_accum(
            C.from_oracle(pts), F.from_ints(sc), w=4, lanes=8, unroll=2))[0]
        want = oracle.IDENTITY
        for pt, s in zip(pts, sc):
            want = want + s * pt
        assert got == want, n


def test_signed_digit_recoding(rng):
    """extract_digits_signed: exact reconstruction, bounded magnitudes, and
    the extra carry window when w*nw < 254 (e.g. w=11: 11*23=253)."""
    from cudabulletproof_tpu.ops import pippenger as PP
    import numpy as np
    vals = [0, 1, S.ELL - 1, 2**253 - 1, rng.randrange(2**253)]
    for w in (3, 4, 5, 6, 8, 11):
        dg = np.asarray(PP.extract_digits_signed(F.from_ints(vals), w))
        half = 1 << (w - 1)
        assert dg.min() >= -half and dg.max() <= half, w
        for i, v in enumerate(vals):
            rec = sum(int(d) << (w * j) for j, d in enumerate(dg[:, i]))
            assert rec == v, (w, v)


def test_madd_precomp_identity_and_values(rng):
    """madd_precomp rows encode (y+x, y-x, 2d*t, -2d*t) of the affine point."""
    from cudabulletproof_tpu.ops import pippenger as PP
    import numpy as np
    pts = [oracle.IDENTITY, oracle.BASE, oracle.hash_to_point(b"mp", 7)]
    pre = np.asarray(PP.madd_precomp(C.from_oracle(pts)))
    for i, p in enumerate(pts):
        x, y = p.affine()
        ypx = F.to_int(pre[i, 0:20])
        ymx = F.to_int(pre[i, 20:40])
        td2 = F.to_int(pre[i, 40:60])
        tdn = F.to_int(pre[i, 60:80])
        assert ypx % oracle.P == (y + x) % oracle.P
        assert ymx % oracle.P == (y - x) % oracle.P
        assert td2 % oracle.P == (oracle.D2 * x * y) % oracle.P
        assert (td2 + tdn) % oracle.P == 0


def test_accum_msm_chunked_routing(rng, monkeypatch):
    """msm_auto above MSM_ACCUM_CHUNK: chunked accumulator MSMs whose
    results ADD (each chunk is a complete MSM since the Horner combine is
    in-kernel), incl. a padded final chunk."""
    from cudabulletproof_tpu import config
    from cudabulletproof_tpu.ops import msm as M2
    monkeypatch.setattr(config, "MSM_PALLAS_SCAN_FORCE", True)
    monkeypatch.setattr(config, "MSM_ACCUM_KERNEL", True)
    monkeypatch.setattr(config, "MSM_ACCUM_WINDOW", 5)
    monkeypatch.setattr(config, "MSM_ACCUM_LANES", 8)
    monkeypatch.setattr(config, "MSM_ACCUM_UNROLL", 2)
    monkeypatch.setattr(config, "MSM_ACCUM_CHUNK", 16)
    monkeypatch.setattr(config, "MSM_PIPPENGER_MIN", 16)
    monkeypatch.setattr(config, "PALLAS_CURVE", False)  # skip ladder fast path
    n = 40                    # 2 full chunks + 1 padded chunk
    pts = [oracle.hash_to_point(b"pbc", i) for i in range(n)]
    sc = [rng.randrange(S.ELL) for _ in range(n)]
    got = C.to_oracle(M2.msm_auto(C.from_oracle(pts), F.from_ints(sc)))[0]
    want = oracle.IDENTITY
    for pt, s in zip(pts, sc):
        want = want + s * pt
    assert got == want
