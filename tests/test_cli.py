"""CLI driver + config + debug-trace smoke tests (reference-test parity:
complete_bulletproof_test.cu scenario via `python -m cudabulletproof_tpu`)."""
import logging

from cudabulletproof_tpu import cli, config
from cudabulletproof_tpu.utils import debug


def test_cli_positive_and_negative(capsys):
    assert cli.positive_test(16, 42)
    assert cli.negative_test(16)
    out = capsys.readouterr().out
    assert "FAILED (CORRECT)" in out     # reference cell-18 wording parity


def test_config_window_model():
    w_small = config.msm_window_for(64)
    w_big = config.msm_window_for(1 << 20)
    assert 4 <= w_small <= w_big <= 13


def test_trace_logging(caplog):
    from cudabulletproof_tpu.models import rangeproof as rp
    from cudabulletproof_tpu.models.generators import get_generators
    old = config.TRACE
    config.TRACE = True
    try:
        with caplog.at_level(logging.DEBUG, logger="cudabulletproof_tpu"):
            gens = get_generators(16)
            proof = rp.prove(5, 123456789, 16, gens)
        text = caplog.text
        assert "PROOF GENERATION STEPS" in text
        assert "t_hat" in text
    finally:
        config.TRACE = old
    assert rp.verify(proof, gens)
