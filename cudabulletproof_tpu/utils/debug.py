"""Protocol observability: step banners + value tracing (opt-in, structured).

Reference parity (SURVEY.md §5 metrics/logging): the reference printf-traces
every intermediate protocol value — print_field_element / print_point /
print_vector_elements (bulletproof_range_proof.cu:23-62) show the first 8
bytes of each scalar/point, plus step banners ("=== PROOF GENERATION STEPS
===", cu:1169) — unconditionally, with no log levels.  Here the same
information is available but gated (BP_TRACE=1 or config.TRACE) and emitted
through the `logging` module, so it composes with real log infrastructure
instead of polluting stdout.
"""
from __future__ import annotations

import logging

import numpy as np

from .. import config

logger = logging.getLogger("cudabulletproof_tpu")


def enabled() -> bool:
    return config.TRACE or logger.isEnabledFor(logging.DEBUG)


def _ensure_handler():
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("[bp] %(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.DEBUG)


def banner(title: str) -> None:
    """Step banner. Reference: e.g. '=== PROOF GENERATION STEPS ==='
    (bulletproof_range_proof.cu:1169)."""
    if enabled():
        _ensure_handler()
        logger.debug("=== %s ===", title)


def _head8(data: bytes) -> str:
    return data[:8].hex()


def trace_scalar(label: str, s: int) -> None:
    """Reference: print_field_element (bulletproof_range_proof.cu:23-35),
    which shows the first 8 little-endian bytes."""
    if enabled():
        _ensure_handler()
        logger.debug("%s: %s...", label, _head8((s % (1 << 256)).to_bytes(32, "little")))


def trace_point(label: str, compressed: bytes) -> None:
    """Reference: print_point (bulletproof_range_proof.cu:38-47)."""
    if enabled():
        _ensure_handler()
        logger.debug("%s: %s... (compressed)", label, _head8(compressed))


def trace_vector(label: str, xs, limit: int = 4) -> None:
    """Reference: print_vector_elements (bulletproof_range_proof.cu:50-62)."""
    if enabled():
        _ensure_handler()
        shown = [hex(x % (1 << 64)) for x in xs[:limit]]
        logger.debug("%s[%d]: %s%s", label, len(xs), ", ".join(shown),
                     ", ..." if len(xs) > limit else "")


def describe_field(a) -> str:
    """Human-readable rendering of a device limb array (host debugging aid)."""
    from ..ops import field as F
    arr = np.asarray(a)
    flat = arr.reshape(-1, F.L)
    vals = [sum(int(v) << (F.W * i) for i, v in enumerate(row)) % F.P
            for row in flat[:4]]
    return f"fe25519{list(arr.shape[:-1])}: " + ", ".join(hex(v) for v in vals)
