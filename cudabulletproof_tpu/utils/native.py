"""ctypes bridge to the native C++ layer (native/libbulletproof.so).

The native library is the host fast path and the second, independent oracle:
field/curve/scalar ops and the full protocol are implemented twice (C++ 5x51
limbs vs JAX 20x13 limbs) and cross-checked bit-exactly in tests/.

Builds on demand with `make -C native` if the .so is missing.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libbulletproof.so"

_lib = None


def available() -> bool:
    try:
        return load() is not None
    except Exception:
        return False


def load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-C", str(_NATIVE_DIR), "libbulletproof.so"],
                       check=True, capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.bp_batch_field_mul.argtypes = [u8p, u8p, u8p, ctypes.c_size_t]
    lib.bp_batch_field_add.argtypes = [u8p, u8p, u8p, ctypes.c_size_t]
    lib.bp_batch_field_sub.argtypes = [u8p, u8p, u8p, ctypes.c_size_t]
    lib.bp_batch_field_square.argtypes = [u8p, u8p, ctypes.c_size_t]
    lib.bp_batch_field_invert.argtypes = [u8p, u8p, ctypes.c_size_t]
    lib.bp_point_add.argtypes = [u8p, u8p, u8p]
    lib.bp_point_add.restype = ctypes.c_int
    lib.bp_point_scalarmult.argtypes = [u8p, u8p, u8p]
    lib.bp_point_scalarmult.restype = ctypes.c_int
    lib.bp_point_msm.argtypes = [u8p, u8p, ctypes.c_size_t, u8p]
    lib.bp_point_msm.restype = ctypes.c_int
    lib.bp_hash_to_point.argtypes = [ctypes.c_char_p, ctypes.c_uint64, u8p]
    lib.bp_point_on_curve.argtypes = [u8p]
    lib.bp_point_on_curve.restype = ctypes.c_int
    lib.bp_scalar_mul.argtypes = [u8p, u8p, u8p]
    lib.bp_scalar_add.argtypes = [u8p, u8p, u8p]
    lib.bp_scalar_invert.argtypes = [u8p, u8p]
    lib.bp_scalar_reduce_wide.argtypes = [u8p, u8p]
    lib.bp_prove_range.argtypes = [ctypes.c_uint64, u8p, ctypes.c_uint32, u8p,
                                   ctypes.c_size_t]
    lib.bp_prove_range.restype = ctypes.c_size_t
    lib.bp_verify_range.argtypes = [u8p, ctypes.c_size_t]
    lib.bp_verify_range.restype = ctypes.c_int
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.bp_prove_agg.argtypes = [u64p, u8p, ctypes.c_uint32, ctypes.c_uint32,
                                 u8p, ctypes.c_size_t]
    lib.bp_prove_agg.restype = ctypes.c_size_t
    lib.bp_verify_agg.argtypes = [u8p, ctypes.c_size_t]
    lib.bp_verify_agg.restype = ctypes.c_int
    lib.bp_pedersen_commit.argtypes = [ctypes.c_uint64, u8p, ctypes.c_uint32, u8p]
    _lib = lib
    return lib


def _buf(data: bytes):
    return (ctypes.c_uint8 * len(data)).from_buffer_copy(data)


def _out(n: int):
    return (ctypes.c_uint8 * n)()


def batch_field_op(op: str, a: bytes, b: bytes | None, n: int) -> bytes:
    lib = load()
    out = _out(32 * n)
    fn = getattr(lib, f"bp_batch_field_{op}")
    if b is None:
        fn(_buf(a), out, n)
    else:
        fn(_buf(a), _buf(b), out, n)
    return bytes(out)


def point_msm(points: bytes, scalars: bytes, n: int) -> bytes | None:
    lib = load()
    out = _out(32)
    rc = lib.bp_point_msm(_buf(points), _buf(scalars), n, out)
    return None if rc else bytes(out)


def point_scalarmult(point: bytes, scalar: bytes) -> bytes | None:
    lib = load()
    out = _out(32)
    rc = lib.bp_point_scalarmult(_buf(point), _buf(scalar), out)
    return None if rc else bytes(out)


def hash_to_point(label: bytes, index: int) -> bytes:
    lib = load()
    out = _out(32)
    lib.bp_hash_to_point(label, index, out)
    return bytes(out)


def prove_range(value: int, gamma: int, nbits: int) -> bytes | None:
    lib = load()
    buf = _out(8192)
    glen = lib.bp_prove_range(value, _buf(gamma.to_bytes(32, "little")), nbits,
                              buf, 8192)
    return bytes(buf[:glen]) if glen else None


def verify_range(proof: bytes) -> bool:
    lib = load()
    return bool(lib.bp_verify_range(_buf(proof), len(proof)))


def prove_agg(values: list, gammas: list, nbits: int) -> bytes | None:
    """Aggregated proof over len(values) values (native host path)."""
    import ctypes as ct
    lib = load()
    m = len(values)
    assert len(gammas) == m
    vals = (ct.c_uint64 * m)(*values)
    gbytes = b"".join(g.to_bytes(32, "little") for g in gammas)
    buf = _out(1 << 16)
    glen = lib.bp_prove_agg(vals, _buf(gbytes), m, nbits, buf, 1 << 16)
    return bytes(buf[:glen]) if glen else None


def verify_agg(proof: bytes) -> bool:
    lib = load()
    return bool(lib.bp_verify_agg(_buf(proof), len(proof)))
