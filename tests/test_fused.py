"""models/fused.py: single-dispatch prover/verifier cross-checks.

The strongest test is mutual acceptance: a fused (device-transcript) proof
must verify under the HOST-transcript verifiers (rangeproof.verify /
verify_deterministic) — any device/host transcript divergence would make
them reject — and vice versa: host proofs must pass the fused on-device
verifier.

CPU-compile budget: the fused PROVER is one giant XLA program (7 MSM groups
+ device SHA-256 transcript + log n IPA rounds); XLA:CPU on this 1-core host
took >50 min at n=8 (killed by the CPU watchdog), so prove-side tests are
gated behind BP_FUSED_CPU_PROVE=1 here and run on real hardware instead
(benchmarks/check_fused_tpu.py exercises prove+verify+tamper on the TPU).
The fused VERIFIER program is ~10x smaller and stays in the default suite,
fed by the host prover.
"""
import dataclasses
import os

import jax
import pytest

from cudabulletproof_tpu.models import fused, rangeproof as rp
from cudabulletproof_tpu.models.generators import get_generators
from cudabulletproof_tpu.utils import scalars as S

N_BITS = 4

_PROVE_OK = (os.environ.get("BP_FUSED_CPU_PROVE")
             or jax.default_backend() == "tpu")
needs_prove = pytest.mark.skipif(
    not _PROVE_OK,
    reason="fused prover XLA:CPU compile >50 min on 1 core; covered on TPU "
           "by benchmarks/check_fused_tpu.py (set BP_FUSED_CPU_PROVE=1 to "
           "force)")


@pytest.fixture(scope="module")
def gens():
    return get_generators(N_BITS)


@pytest.fixture(scope="module")
def hproof(gens):
    return rp.prove(13, S.sc_random(), N_BITS, gens)


def test_host_prove_accepted_by_fused_verify(gens, hproof):
    assert fused.verify(hproof, gens)


def test_fused_verify_rejects_tampering(gens, hproof):
    bad = dataclasses.replace(hproof, t_hat=(hproof.t_hat + 1) % S.ELL)
    assert not fused.verify(bad, gens)
    bad = dataclasses.replace(hproof, V=hproof.A)
    assert not fused.verify(bad, gens)
    bad_ip = dataclasses.replace(hproof.ip, a=(hproof.ip.a * 2) % S.ELL)
    assert not fused.verify(dataclasses.replace(hproof, ip=bad_ip), gens)


def test_fused_verify_rejects_small_order(gens, hproof):
    from cudabulletproof_tpu.utils import oracle
    tor = oracle.small_order_points()
    bad = dataclasses.replace(hproof, A=tor[1].compress())
    assert not fused.verify(bad, gens)


def test_fused_verify_rejects_malformed(gens, hproof):
    assert not fused.verify(dataclasses.replace(hproof, V=b"\x00" * 31), gens)
    bad_ip = dataclasses.replace(hproof.ip, L=hproof.ip.L[:-1])
    assert not fused.verify(dataclasses.replace(hproof, ip=bad_ip), gens)
    small = get_generators(N_BITS // 2)       # undersized gens -> False
    assert not fused.verify(hproof, small)


def test_fused_batch_verify(gens, hproof):
    proofs = [hproof, rp.prove(3, S.sc_random(), N_BITS, gens)]
    # both programs: merged single-MSM batch (default) and vmapped-independent
    for merged in (True, False):
        assert fused.batch_verify(proofs, gens, merged=merged), merged
        bad = dataclasses.replace(hproof, mu=(hproof.mu + 1) % S.ELL)
        assert not fused.batch_verify([proofs[1], bad], gens,
                                      merged=merged), merged
    assert fused.batch_verify([], gens)


@needs_prove
def test_fused_prove_accepted_everywhere(gens):
    fproof = fused.prove(11, S.sc_random(), N_BITS, gens)
    assert fused.verify(fproof, gens)
    assert rp.verify(fproof, gens)
    assert rp.verify_deterministic(fproof, gens)


@needs_prove
def test_fused_out_of_range_refused(gens):
    with pytest.raises(rp.ProveError):
        fused.prove(1 << N_BITS, 1, N_BITS, gens)


def test_fused_msm_accum_routing(rng, monkeypatch):
    """_msm_compressed / _msm_point with the accumulator kernel forced on
    (interpret mode) match the ladder path — validates the round-4 fused
    MSM routing without compiling a whole fused program on CPU."""
    import jax.numpy as jnp
    from cudabulletproof_tpu import config
    from cudabulletproof_tpu.ops import curve as C, scalar_field as SC
    from cudabulletproof_tpu.utils import oracle
    monkeypatch.setattr(config, "MSM_PALLAS_SCAN_FORCE", True)
    monkeypatch.setattr(config, "MSM_ACCUM_KERNEL", True)
    monkeypatch.setattr(config, "MSM_ACCUM_WINDOW", 5)
    monkeypatch.setattr(config, "MSM_ACCUM_LANES", 8)
    monkeypatch.setattr(config, "MSM_ACCUM_UNROLL", 2)
    m = 32
    pts = C.from_oracle([oracle.hash_to_point(b"fmr", i) for i in range(m)])
    sc = SC.from_ints([rng.randrange(S.ELL) for _ in range(m)])[None]
    assert fused._use_accum()
    monkeypatch.setattr(config, "FUSED_ACCUM_MIN", 16)   # accum route
    got = fused._msm_compressed(pts, sc)
    monkeypatch.setattr(config, "FUSED_ACCUM_MIN", 64)   # ladder route
    want = fused._msm_compressed(pts, sc)
    assert jnp.array_equal(got, want)
    gp = fused._msm_point(pts, sc[0])
    monkeypatch.setattr(config, "FUSED_ACCUM_MIN", 16)
    ga = fused._msm_point(pts, sc[0])
    assert bool(C.eq(ga, gp))
