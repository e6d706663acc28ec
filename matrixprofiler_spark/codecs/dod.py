"""Delta-of-delta integer compression (Gorilla timestamp scheme, Pelkonen
et al. VLDB 2015 §4.1.1), for bucket ids / sequence offsets.

Stream layout (bit-aligned, MSB-first):
  [64b] first value (int64, two's complement)
  [64b] first delta
  per subsequent value, D = delta(i) - delta(i-1):
    '0'              D == 0
    '10'   +  7b     D in [-63, 64]
    '110'  +  9b     D in [-255, 256]
    '1110' + 12b     D in [-2047, 2048]
    '1111' + 64b     otherwise (full int64; Gorilla uses 32b for seconds,
                     we widen to cover arbitrary offsets)

Field values are stored biased (D + 2^(k-1) - 1 shifted into unsigned k-bit
range). Encode is vectorized numpy bit assembly; decode is a bit reader.
"""

from __future__ import annotations

import numpy as np

from .gorilla import _BitReader, _assemble, _dshift

_BUCKETS = (
    (7, -63, 64),
    (9, -255, 256),
    (12, -2047, 2048),
)


def dod_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = v.size
    header = np.uint32(n).tobytes()
    if n == 0:
        return header

    def rec(X, bit_off, nbits_after):
        """One field as a (hi, lo, byte_off) record: X's value ends
        ``nbits_after`` bits after ``bit_off``."""
        p = bit_off & 7
        hi, lo = _dshift(np.asarray(X, dtype=np.uint64), 128 - p - nbits_after)
        return hi, lo, bit_off >> 3

    z64 = np.zeros(1, dtype=np.int64)
    if n == 1:
        return header + _assemble([rec(v[:1].view(np.uint64), z64, 64)], 8).tobytes()

    delta = np.diff(v)
    dod = np.diff(delta) if n > 2 else np.empty(0, dtype=np.int64)
    m = dod.size

    zero = dod == 0
    fit7 = (~zero) & (dod >= -63) & (dod <= 64)
    fit9 = (~zero) & (~fit7) & (dod >= -255) & (dod <= 256)
    fit12 = (~zero) & (~fit7) & (~fit9) & (dod >= -2047) & (dod <= 2048)
    full = (~zero) & (~fit7) & (~fit9) & (~fit12)

    nbits = np.select(
        [zero, fit7, fit9, fit12, full],
        [1, 2 + 7, 3 + 9, 4 + 12, 4 + 64],
    ).astype(np.int64)
    total = 128 + int(nbits.sum())
    total_bytes = (total + 7) // 8

    recs = [
        rec(v[:1].view(np.uint64), z64, 64),
        rec(delta[:1].astype(np.int64).view(np.uint64), z64 + 64, 64),
    ]
    starts = (128 + np.concatenate(([0], np.cumsum(nbits)[:-1]))
              if m else np.empty(0, np.int64))
    # control prefix + biased payload per class ('10','110','1110','1111'),
    # OR-merged into one record per value
    for (w, lo_b, _hi), mask, prefix, plen in (
        (_BUCKETS[0], fit7, 2, 2),
        (_BUCKETS[1], fit9, 6, 3),
        (_BUCKETS[2], fit12, 14, 4),
        ((64, None, None), full, 15, 4),
    ):
        if not mask.any():
            continue
        so = starts[mask]
        p = so & 7
        h1, l1 = _dshift(np.full(int(mask.sum()), prefix, dtype=np.uint64),
                         128 - p - plen)
        payload = (dod[mask].view(np.uint64) if lo_b is None
                   else (dod[mask] - lo_b).astype(np.uint64))
        h2, l2 = _dshift(payload, 128 - p - plen - w)
        recs.append((h1 | h2, l1 | l2, so >> 3))

    return header + _assemble(recs, total_bytes).tobytes()


def dod_decode(data: bytes) -> np.ndarray:
    n = int(np.frombuffer(data[:4], dtype=np.uint32)[0])
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    r = _BitReader(data[4:])
    out[0] = np.uint64(r.read(64)).astype(np.int64)
    if n == 1:
        return out
    delta = np.uint64(r.read(64)).astype(np.int64)
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read1() == 0:
            dod = 0
        elif r.read1() == 0:
            dod = r.read(7) - 63
        elif r.read1() == 0:
            dod = r.read(9) - 255
        elif r.read1() == 0:
            dod = r.read(12) - 2047
        else:
            dod = np.uint64(r.read(64)).astype(np.int64)
        with np.errstate(over="ignore"):  # int64 wraparound mirrors encode
            delta = delta + dod
            out[i] = out[i - 1] + delta
    return out
