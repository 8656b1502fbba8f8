"""Aggregated range proofs and batched verification."""
import dataclasses

import pytest

from cudabulletproof_tpu.models import aggregate as agg, rangeproof as rp
from cudabulletproof_tpu.models.generators import get_generators
from cudabulletproof_tpu.utils import scalars as S

N_BITS = 8     # keep CPU test cost low; 8*4 = 32 generators


@pytest.fixture(scope="module")
def gens():
    return get_generators(N_BITS * 4)


def test_aggregated_roundtrip(gens):
    values = [42, 0, 255, 129]
    blinds = [S.sc_random() for _ in values]
    proof = agg.prove(values, blinds, N_BITS, gens)
    assert proof.m == 4 and proof.ip.n == N_BITS * 4
    assert agg.verify(proof, gens)


def test_aggregated_rejects_out_of_range(gens):
    blinds = [S.sc_random()] * 2
    with pytest.raises(rp.ProveError):
        agg.prove([1, 256], blinds, N_BITS, gens)


def test_aggregated_tamper_rejected(gens):
    values = [7, 200]
    blinds = [S.sc_random() for _ in values]
    proof = agg.prove(values, blinds, N_BITS, get_generators(N_BITS * 2))
    g2 = get_generators(N_BITS * 2)
    assert agg.verify(proof, g2)
    bad = dataclasses.replace(proof, t_hat=(proof.t_hat + 1) % S.ELL)
    assert not agg.verify(bad, g2)
    bad = dataclasses.replace(proof, V=[proof.V[1], proof.V[0]])
    assert not agg.verify(bad, g2)


def test_batch_verify(gens):
    g16 = get_generators(N_BITS)
    proofs = [rp.prove(v, S.sc_random(), N_BITS, g16) for v in [3, 77, 255]]
    assert agg.batch_verify(proofs, g16)
    # one bad proof poisons the batch
    bad = dataclasses.replace(proofs[1], mu=(proofs[1].mu + 1) % S.ELL)
    assert not agg.batch_verify([proofs[0], bad, proofs[2]], g16)
    assert agg.batch_verify([], g16)
