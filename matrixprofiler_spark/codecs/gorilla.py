"""Gorilla XOR compression for float64 series (Pelkonen et al., "Gorilla:
A Fast, Scalable, In-Memory Time Series Database", VLDB 2015, §4.1.2).

Stream layout (bit-aligned, MSB-first):
  [64b]  first value, raw IEEE-754 bits
  per subsequent value v, x = bits(v) XOR bits(prev):
    '0'                                   x == 0 (repeat)
    '10' + meaningful bits                x fits the previous block window
    '11' + 5b leading + 6b sig-len + bits new block window
  (sig-len stores length-1 in 6 bits so 64 fits; 0 -> length 64)

The ENCODER always emits the '11' branch (a spec-compliant choice — '10'
window reuse is an optional encoder optimization), which removes the
sequential control-flow dependency and lets the whole encode be vectorized
numpy bit assembly. The DECODER handles both '10' and '11' so any compliant
Gorilla stream decodes.

Losslessness: XOR round-trips every bit pattern, so -0.0, infinities and
NaN payloads are preserved exactly (tests/test_codecs.py).
"""

from __future__ import annotations

import numpy as np


def _clz64(x: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64 (vectorized)."""
    out = np.full(x.shape, 64, dtype=np.int64)
    nz = x != 0
    # float64 mantissa trick is unsafe for >53-bit values; do it in halves
    hi = (x >> np.uint64(32)).astype(np.uint32)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi_bits = np.zeros(x.shape, dtype=np.int64)
    m = hi != 0
    hi_bits[m] = 32 - (np.floor(np.log2(hi[m].astype(np.float64))).astype(np.int64) + 1)
    lo_bits = np.zeros(x.shape, dtype=np.int64)
    ml = (hi == 0) & (lo != 0)
    lo_bits[ml] = 32 - (np.floor(np.log2(lo[ml].astype(np.float64))).astype(np.int64) + 1)
    out[m] = hi_bits[m]
    out[ml] = 32 + lo_bits[ml]
    return out


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Count trailing zeros of uint64 (vectorized)."""
    out = np.full(x.shape, 64, dtype=np.int64)
    nz = x != 0
    lowbit = (x & (~x + np.uint64(1)))[nz]  # isolate lowest set bit
    out[nz] = 63 - _clz64(lowbit)
    return out


def _emit_bits(bitbuf: np.ndarray, offsets: np.ndarray, field: np.ndarray,
               width, mask: np.ndarray | None = None) -> None:
    """Write `width`-bit big-endian fields at per-value bit offsets.

    width may be a scalar int or per-value int array (variable width).
    Loops over bit positions (<=64 iterations), vectorized over values."""
    if np.isscalar(width):
        widths = np.full(field.shape, width, dtype=np.int64)
    else:
        widths = width
    maxw = int(widths.max()) if widths.size else 0
    for k in range(maxw):
        sel = widths > k
        if mask is not None:
            sel = sel & mask
        if not sel.any():
            continue
        shift = (widths[sel] - 1 - k).astype(np.uint64)
        bits = ((field[sel] >> shift) & np.uint64(1)).astype(np.uint8)
        bitbuf[offsets[sel] + k] = bits


def gorilla_encode(values: np.ndarray) -> bytes:
    """Encode a float64 array -> Gorilla bitstream (bytes).

    Header: uint32 count (little-endian), then the bit stream."""
    v = np.ascontiguousarray(values, dtype=np.float64)
    n = v.size
    header = np.uint32(n).tobytes()
    if n == 0:
        return header
    bits_v = v.view(np.uint64)
    xor = np.empty(n - 1, dtype=np.uint64) if n > 1 else np.empty(0, dtype=np.uint64)
    if n > 1:
        xor[:] = bits_v[1:] ^ bits_v[:-1]

    zero = xor == np.uint64(0)
    lz = np.minimum(_clz64(xor), 31)  # 5-bit field
    tz = _ctz64(xor)
    siglen = np.where(zero, 0, 64 - lz - tz).astype(np.int64)

    # bits per value: 1 for repeats, 2+5+6+siglen otherwise
    nbits = np.where(zero, 1, 13 + siglen)
    total = 64 + int(nbits.sum())
    bitbuf = np.zeros(total, dtype=np.uint8)

    # first value raw
    _emit_bits(bitbuf, np.array([0], dtype=np.int64), bits_v[:1], 64)

    if n > 1:
        starts = 64 + np.concatenate(([0], np.cumsum(nbits)[:-1]))
        nz = ~zero
        # control bits: repeats get '0' (already zero-initialized); '11' else
        bitbuf[starts[nz]] = 1
        bitbuf[starts[nz] + 1] = 1
        _emit_bits(bitbuf, starts + 2, lz.astype(np.uint64), 5, mask=nz)
        # 6-bit sig-len stores length-1 (64 -> 63)
        _emit_bits(bitbuf, starts + 7, (siglen - 1).clip(0).astype(np.uint64), 6, mask=nz)
        meaningful = np.zeros(n - 1, dtype=np.uint64)
        meaningful[nz] = xor[nz] >> tz[nz].astype(np.uint64)
        _emit_bits(bitbuf, starts + 13, meaningful, siglen, mask=nz)

    return header + np.packbits(bitbuf).tobytes()


class _BitReader:
    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, k: int) -> int:
        out = 0
        for b in self.bits[self.pos : self.pos + k]:
            out = (out << 1) | int(b)
        self.pos += k
        return out

    def read1(self) -> int:
        b = int(self.bits[self.pos])
        self.pos += 1
        return b


def gorilla_decode(data: bytes) -> np.ndarray:
    """Decode a Gorilla bitstream -> float64 array. Handles both the '10'
    (window reuse) and '11' (new window) branches."""
    n = int(np.frombuffer(data[:4], dtype=np.uint32)[0])
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    r = _BitReader(data[4:])
    prev = np.uint64(r.read(64))
    out[0] = prev
    lz, siglen = 0, 0
    for i in range(1, n):
        if r.read1() == 0:
            out[i] = prev
            continue
        if r.read1() == 1:  # '11' new window
            lz = r.read(5)
            siglen = r.read(6) + 1
        # else '10': reuse previous lz/siglen
        meaningful = r.read(siglen)
        tz = 64 - lz - siglen
        prev = prev ^ (np.uint64(meaningful) << np.uint64(tz))
        out[i] = prev
    return out.view(np.float64)
