"""Proof wire format, byte-compatible with native/bulletproof.cpp::serialize.

Layout:
  u32 n (range bits, LE)
  V A S T1 T2                    5 x 32 bytes (compressed points)
  taux mu t_hat                  3 x 32 bytes (scalars, LE)
  u32 k (= log2 n)
  k x (L_j, R_j)                 2k x 32 bytes
  a b                            2 x 32 bytes

The reference has no proof serialization at all (SURVEY.md §5: the compressed
point type exists but is never used by the protocol); this adds the missing
checkpoint/interop capability, shared across the native and TPU paths.
"""
from __future__ import annotations

import struct

from ..models import ipa as ipa_mod
from ..models import rangeproof as rp_mod
from .scalars import ELL


def serialize_range_proof(p: "rp_mod.RangeProof") -> bytes:
    out = bytearray()
    out += struct.pack("<I", p.n)
    for blob in [p.V, p.A, p.S, p.T1, p.T2]:
        assert len(blob) == 32
        out += blob
    for s in [p.taux, p.mu, p.t_hat]:
        out += (s % ELL).to_bytes(32, "little")
    out += struct.pack("<I", len(p.ip.L))
    for l_b, r_b in zip(p.ip.L, p.ip.R):
        out += l_b + r_b
    out += (p.ip.a % ELL).to_bytes(32, "little")
    out += (p.ip.b % ELL).to_bytes(32, "little")
    return bytes(out)


def deserialize_range_proof(data: bytes) -> "rp_mod.RangeProof":
    off = 0

    def take(k):
        nonlocal off
        if off + k > len(data):
            raise ValueError("truncated proof")
        blob = data[off:off + k]
        off += k
        return blob

    n = struct.unpack("<I", take(4))[0]
    pts = [take(32) for _ in range(5)]
    taux, mu, t_hat = (int.from_bytes(take(32), "little") for _ in range(3))
    k = struct.unpack("<I", take(4))[0]
    if k > 32:
        raise ValueError("bad round count")
    L, R = [], []
    for _ in range(k):
        L.append(take(32))
        R.append(take(32))
    a = int.from_bytes(take(32), "little")
    b = int.from_bytes(take(32), "little")
    if off != len(data):
        raise ValueError("trailing bytes")
    ip = ipa_mod.InnerProductProof(n=(1 << k) if k else 1, L=L, R=R, a=a, b=b)
    return rp_mod.RangeProof(n=n, V=pts[0], A=pts[1], S=pts[2], T1=pts[3],
                             T2=pts[4], taux=taux, mu=mu, t_hat=t_hat, ip=ip)


# --- aggregated proofs (m values, one proof) ---------------------------------
# Layout (native counterpart: native/bulletproof.cpp::serialize_agg):
#   u32 n | u32 m
#   m x V_j                        32 bytes each
#   A S T1 T2                      4 x 32 bytes
#   taux mu t_hat                  3 x 32 bytes
#   u32 k (= log2(n*m))
#   k x (L_j, R_j)                 2k x 32 bytes
#   a b                            2 x 32 bytes

def serialize_aggregated_proof(p) -> bytes:
    from ..models import aggregate as agg_mod
    assert isinstance(p, agg_mod.AggregatedRangeProof)
    out = bytearray()
    out += struct.pack("<II", p.n, p.m)
    assert len(p.V) == p.m
    for blob in [*p.V, p.A, p.S, p.T1, p.T2]:
        assert len(blob) == 32
        out += blob
    for s in [p.taux, p.mu, p.t_hat]:
        out += (s % ELL).to_bytes(32, "little")
    out += struct.pack("<I", len(p.ip.L))
    for l_b, r_b in zip(p.ip.L, p.ip.R):
        out += l_b + r_b
    out += (p.ip.a % ELL).to_bytes(32, "little")
    out += (p.ip.b % ELL).to_bytes(32, "little")
    return bytes(out)


def deserialize_aggregated_proof(data: bytes):
    from ..models import aggregate as agg_mod
    off = 0

    def take(k):
        nonlocal off
        if off + k > len(data):
            raise ValueError("truncated proof")
        blob = data[off:off + k]
        off += k
        return blob

    n, m = struct.unpack("<II", take(8))
    if m > 1 << 20:
        raise ValueError("bad aggregation count")
    V = [take(32) for _ in range(m)]
    pts = [take(32) for _ in range(4)]
    taux, mu, t_hat = (int.from_bytes(take(32), "little") for _ in range(3))
    k = struct.unpack("<I", take(4))[0]
    if k > 32:
        raise ValueError("bad round count")
    L, R = [], []
    for _ in range(k):
        L.append(take(32))
        R.append(take(32))
    a = int.from_bytes(take(32), "little")
    b = int.from_bytes(take(32), "little")
    if off != len(data):
        raise ValueError("trailing bytes")
    ip = ipa_mod.InnerProductProof(n=(1 << k) if k else 1, L=L, R=R, a=a, b=b)
    return agg_mod.AggregatedRangeProof(
        n=n, m=m, V=V, A=pts[0], S=pts[1], T1=pts[2], T2=pts[3],
        taux=taux, mu=mu, t_hat=t_hat, ip=ip)
