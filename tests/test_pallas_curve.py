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
