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
    Fixed width: one vectorized pass per bit position. Variable width:
    values are sorted by width descending so bit-position k only touches
    the values that actually have a k-th bit — total work is proportional
    to the total number of bits written, not values x max width."""
    if np.isscalar(width):
        if mask is not None:
            offsets = offsets[mask]
            field = field[mask]
        w = int(width)
        for k in range(w):
            shift = np.uint64(w - 1 - k)
            bits = ((field >> shift) & np.uint64(1)).astype(np.uint8)
            bitbuf[offsets + k] = bits
        return

    widths = np.asarray(width, dtype=np.int64)
    if mask is not None:
        offsets = offsets[mask]
        field = field[mask]
        widths = widths[mask]
    if widths.size == 0:
        return
    order = np.argsort(-widths, kind="stable")
    offsets = offsets[order]
    field = field[order]
    widths = widths[order]
    neg_ws = -widths  # ascending
    maxw = int(widths[0])
    for k in range(maxw):
        cnt = int(np.searchsorted(neg_ws, -k, side="left"))
        if cnt == 0:
            break
        shift = (widths[:cnt] - 1 - k).astype(np.uint64)
        bits = ((field[:cnt] >> shift) & np.uint64(1)).astype(np.uint8)
        bitbuf[offsets[:cnt] + k] = bits


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


def gorilla_encode_many(arrays) -> list[bytes]:
    """Encode MANY float64 series in one vectorized bit-assembly.

    Produces byte-for-byte the same stream per series as
    ``gorilla_encode`` (verified in tests), but amortizes the ~25 masked
    vector passes over the whole batch instead of per series — the encode
    hot path of the per-doc window-stats kernel.
    """
    arrays = [np.ascontiguousarray(a, dtype=np.float64) for a in arrays]
    all_sizes = np.array([a.size for a in arrays], dtype=np.int64)
    n_all = len(arrays)
    if n_all == 0:
        return []
    total = int(all_sizes.sum())
    if total == 0:
        return [np.uint32(0).tobytes() for _ in arrays]

    # work only over non-empty series (an empty series between/after
    # non-empty ones would otherwise produce out-of-range reduceat starts)
    keep = np.nonzero(all_sizes > 0)[0]
    arrays_ne = [arrays[i] for i in keep]
    sizes = all_sizes[keep]
    n_series = sizes.size

    v = np.concatenate(arrays_ne).view(np.uint64)
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    is_first = np.zeros(total, dtype=bool)
    is_first[starts] = True

    xor = np.zeros(total, dtype=np.uint64)
    xor[1:] = v[1:] ^ v[:-1]
    xor[is_first] = 0  # unused for first elements

    zero = (xor == np.uint64(0)) & ~is_first
    lz = np.minimum(_clz64(xor), 31)
    tz = _ctz64(xor)
    siglen = np.where(zero | is_first, 0, 64 - lz - tz).astype(np.int64)

    nbits = np.where(is_first, 64, np.where(zero, 1, 13 + siglen))
    # per-series bit length, padded to a byte boundary so series streams
    # can be sliced out of the shared buffer independently
    series_bits = np.add.reduceat(nbits, starts) if total else np.zeros(0)
    series_bits = np.asarray(series_bits, dtype=np.int64)
    padded_bits = ((series_bits + 7) // 8) * 8
    series_bit_starts = np.concatenate(([0], np.cumsum(padded_bits)[:-1]))

    # bit offset of each value: series start + within-series cumsum
    within = np.cumsum(nbits) - nbits
    within = within - np.repeat(within[starts], sizes)
    offsets = np.repeat(series_bit_starts, sizes) + within

    bitbuf = np.zeros(int(padded_bits.sum()), dtype=np.uint8)

    # first values: raw 64 bits
    _emit_bits(bitbuf, offsets[is_first], v[is_first], 64)
    # non-repeat, non-first: '11' + 5b lz + 6b (siglen-1) + meaningful bits
    nz = ~zero & ~is_first
    bitbuf[offsets[nz]] = 1
    bitbuf[offsets[nz] + 1] = 1
    _emit_bits(bitbuf, offsets[nz] + 2, lz[nz].astype(np.uint64), 5)
    _emit_bits(bitbuf, offsets[nz] + 7, (siglen[nz] - 1).clip(0).astype(np.uint64), 6)
    meaningful = np.zeros(total, dtype=np.uint64)
    meaningful[nz] = xor[nz] >> tz[nz].astype(np.uint64)
    _emit_bits(bitbuf, offsets[nz] + 13, meaningful[nz], siglen[nz])
    # repeats are control bit '0' (already zeroed)

    packed = np.packbits(bitbuf)
    byte_starts = series_bit_starts // 8
    byte_lens = padded_bits // 8
    out: list[bytes] = [np.uint32(0).tobytes()] * n_all
    for j in range(n_series):
        body = packed[byte_starts[j] : byte_starts[j] + byte_lens[j]].tobytes()
        out[int(keep[j])] = np.uint32(sizes[j]).tobytes() + body
    return out
