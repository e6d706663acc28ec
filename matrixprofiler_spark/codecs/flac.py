"""Dependency-free FLAC decoder (subset) + fixed-predictor encoder.

FLAC frames are bit-packed but need no external entropy library — the
residuals are Rice-coded and the predictors are 4 fixed polynomials — so
a faithful subset decodes with pure Python/numpy bit reading, the same
way codecs/media.py handles WAV/BMP/PNG.

Decoder coverage (refuses loudly outside it):
* STREAMINFO metadata block (other blocks skipped), 8/16-bit samples
* fixed-blocksize frames, all block-size codes incl. 8/16-bit tails
* channel assignments: independent (any count), left/side, right/side,
  mid/side
* subframes: CONSTANT, VERBATIM, FIXED orders 0-4, and LPC orders 1-32
  (quantized integer predictors, arithmetic right-shift per spec), with
  wasted bits
* residuals: Rice method 0 (4-bit params) and 1 (5-bit params), any
  partition order, escape partitions
* CRC-8 of every frame header and CRC-16 of every frame are VERIFIED

Out of subset: sample sizes other than 8/16 raise NotImplementedError —
the writer below never emits them, and the error names the construct.

The encoder emits CONSTANT/FIXED subframes (best of orders 0-2 per
channel, single Rice partition) — and, with ``max_lpc_order > 0``,
real LPC subframes (windowless autocorrelation → Levinson-Durbin →
quantized integer coefficients, cheapest of FIXED/LPC per channel) — a
spec-valid FLAC stream any conforming decoder plays, so tests can
round-trip deterministic fixtures without an external reference encoder.
"""

from __future__ import annotations

import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        v = 0
        while bits:
            if self.byte >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(bits, avail)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            bits -= take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v & (1 << (bits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self):
        if self.bit:
            self.bit = 0
            self.byte += 1


def _zigzag(x: np.ndarray) -> np.ndarray:
    return (x << 1) ^ (x >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


# ---------------------------------------------------------------- encode

def write_flac(samples: np.ndarray, sample_rate: int, block_size: int = 4096,
               stereo_mode: str = "independent",
               max_lpc_order: int = 0) -> bytes:
    """Encode int16 samples — 1-D (mono) or (n, channels) — as a valid
    FLAC stream: fixed block size, per-channel best-of CONSTANT /
    FIXED(0-2) subframes, one Rice partition. ``stereo_mode`` (2-channel
    input only): "independent", "left_side", "right_side" or "mid_side"
    — the inter-channel decorrelation variants, so decoder tests cover
    every reconstruction path. ``max_lpc_order > 0`` additionally tries
    quantized-LPC subframes up to that order and keeps whichever of
    FIXED/LPC costs fewer bits per channel."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    if stereo_mode != "independent" and ch != 2:
        raise ValueError("stereo_mode needs exactly 2 channels")
    bps = 16

    out = bytearray(FLAC_MAGIC)
    # STREAMINFO, marked as the last metadata block
    info = struct.pack(">HH", block_size, block_size) + b"\x00" * 6
    # one 64-bit group: rate(20) | channels-1(3) | bps-1(5) | total(36)
    group = (sample_rate << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | n
    info += struct.pack(">Q", group) + b"\x00" * 16  # zero MD5
    out += bytes([0x80]) + struct.pack(">I", len(info))[1:] + info

    for fno, start in enumerate(range(0, n, block_size)):
        blk = s[start : start + block_size]
        out += _encode_frame(blk, fno, block_size, bps, stereo_mode,
                             max_lpc_order)
    return bytes(out)


def _utf8_number(v: int) -> bytes:
    # FLAC's UTF-8-style coded number (frame index for fixed blocking)
    if v < 0x80:
        return bytes([v])
    if v < 0x800:
        return bytes([0xC0 | (v >> 6), 0x80 | (v & 0x3F)])
    if v < 0x10000:
        return bytes([0xE0 | (v >> 12), 0x80 | ((v >> 6) & 0x3F), 0x80 | (v & 0x3F)])
    raise NotImplementedError("frame number >= 2^16 in this encoder")


def _encode_frame(blk: np.ndarray, fno: int, declared_bs: int, bps: int,
                  stereo_mode: str = "independent",
                  max_lpc_order: int = 0) -> bytes:
    bs, ch = blk.shape
    if stereo_mode == "independent":
        ca = ch - 1
        subs = [(blk[:, c], bps) for c in range(ch)]
    else:
        left, right = blk[:, 0], blk[:, 1]
        side = left - right
        if stereo_mode == "left_side":
            ca, subs = 8, [(left, bps), (side, bps + 1)]
        elif stereo_mode == "right_side":
            ca, subs = 9, [(side, bps + 1), (right, bps)]
        elif stereo_mode == "mid_side":
            ca, subs = 10, [((left + right) >> 1, bps), (side, bps + 1)]
        else:
            raise ValueError(f"stereo_mode {stereo_mode!r}")
    head = bytearray()
    head += bytes([0xFF, 0xF8])  # sync + reserved0 + fixed blocking
    # block size code 0111 = 16-bit value-1 at end; rate 0000 = STREAMINFO
    head += bytes([(0b0111 << 4) | 0b0000])
    # channel assignment, sample size 100 (16 bit), reserved 0
    head += bytes([(ca << 4) | (0b100 << 1)])
    head += _utf8_number(fno)
    head += struct.pack(">H", bs - 1)
    head += bytes([_crc8(bytes(head))])

    w = _BitWriter()
    w.bytes = bytearray(head)
    for x, sub_bps in subs:
        _encode_subframe(w, x, sub_bps, max_lpc_order)
    w.align()
    body = bytes(w.bytes)
    return body + struct.pack(">H", _crc16(body))


def _rice_param_and_cost(res: np.ndarray) -> tuple[int, int]:
    zz = _zigzag(res)
    mean = max(1.0, float(zz.mean()))
    r = min(14, max(0, int(np.log2(mean))))
    return r, int(zz.size * (r + 1) + (zz >> r).sum())


def _levinson(x: np.ndarray, max_order: int) -> list[np.ndarray]:
    """Float LPC coefficients for orders 1..max_order via autocorrelation
    + Levinson-Durbin; returns the per-order coefficient vectors (the
    public FLAC encoding recipe — spec §, no windowing needed for the
    deterministic fixtures this encoder serves)."""
    xf = x.astype(np.float64)
    n = xf.size
    ac = np.array([float(np.dot(xf[: n - k], xf[k:]))
                   for k in range(max_order + 1)])
    if ac[0] == 0.0:
        return []
    out = []
    err = ac[0]
    lpc = np.zeros(0)
    for i in range(max_order):
        acc = ac[i + 1] - (np.dot(lpc, ac[i:0:-1]) if i else 0.0)
        if err <= 0.0:
            break
        k = acc / err
        lpc = np.concatenate([lpc - k * lpc[::-1], [k]])
        err *= 1.0 - k * k
        out.append(lpc.copy())
    return out


def _quantize_lpc(lpc: np.ndarray, prec: int = 14) -> tuple[np.ndarray, int]:
    cmax = float(np.abs(lpc).max())
    if cmax <= 0.0:
        return np.zeros(lpc.size, dtype=np.int64), 0
    # choose the largest shift <= 15 keeping coefs inside prec signed bits
    shift = min(15, max(0, (prec - 1) - int(np.floor(np.log2(cmax))) - 1))
    q = np.round(lpc * (1 << shift)).astype(np.int64)
    lim = 1 << (prec - 1)
    return np.clip(q, -lim, lim - 1), shift


def _encode_subframe(w: _BitWriter, x: np.ndarray, bps: int,
                     max_lpc_order: int = 0):
    if np.all(x == x[0]):
        w.write(0b000000 << 1, 8)  # pad + CONSTANT + no wasted bits
        w.write(int(x[0]), bps)
        return
    best, best_cost = None, None
    for order in (0, 1, 2):
        if x.size <= order:
            continue
        res = x[order:].copy()
        for i, cf in enumerate(_FIXED_COEFS[order]):
            res = res - cf * x[order - 1 - i : x.size - 1 - i]
        r, cost = _rice_param_and_cost(res)
        cost += order * bps
        if best_cost is None or cost < best_cost:
            best, best_cost = ("fixed", order, res, r, None), cost
    PREC = 14
    if max_lpc_order > 0:
        for lpc in _levinson(x, min(max_lpc_order, 32, x.size - 1)):
            order = lpc.size
            qc, shift = _quantize_lpc(lpc, PREC)
            pred = np.zeros(x.size - order, dtype=np.int64)
            for j in range(order):
                pred += qc[j] * x[order - 1 - j : x.size - 1 - j]
            res = x[order:] - (pred >> shift)
            r, cost = _rice_param_and_cost(res)
            cost += order * (bps + PREC) + 4 + 5
            if cost < best_cost:
                best, best_cost = ("lpc", order, res, r, (qc, shift)), cost
    kind, order, res, r, extra = best
    w.write(0, 1)
    if kind == "fixed":
        w.write(0b001000 | order, 6)  # FIXED, order
    else:
        w.write(0b100000 | (order - 1), 6)  # LPC, order-1
    w.write(0, 1)  # no wasted bits
    for i in range(order):
        w.write(int(x[i]), bps)
    if kind == "lpc":
        qc, shift = extra
        w.write(PREC - 1, 4)
        w.write(shift, 5)
        for c in qc:
            w.write(int(c), PREC)
    w.write(0, 2)   # residual method 0 (4-bit Rice)
    w.write(0, 4)   # partition order 0
    w.write(r, 4)
    for v in _zigzag(res):
        w.write_unary(int(v) >> r)
        if r:
            w.write(int(v) & ((1 << r) - 1), r)


# ---------------------------------------------------------------- decode

def parse_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream (subset above); returns (float32 samples in
    [-1, 1) shaped (n, channels), sample_rate) — same contract as
    parse_wav."""
    if payload[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    while True:
        hdr = payload[pos]
        btype = hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + ln]
        if btype == 0:
            info = body
        pos += 4 + ln
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("missing STREAMINFO")
    group = int.from_bytes(info[10:18], "big")
    sample_rate = group >> 44
    channels = ((group >> 41) & 0x7) + 1
    bps = ((group >> 36) & 0x1F) + 1
    total = group & ((1 << 36) - 1)
    if bps not in (8, 16):
        raise NotImplementedError(f"{bps}-bit FLAC (subset: 8/16)")

    chans: list[list[np.ndarray]] = [[] for _ in range(channels)]
    got = 0
    while pos < len(payload) and (total == 0 or got < total):
        pos, block = _decode_frame(payload, pos, channels, bps, sample_rate)
        for c in range(channels):
            chans[c].append(block[c])
        got += block[0].size
    x = np.stack([np.concatenate(c) for c in chans], axis=1)
    if total:
        x = x[:total]
    scale = np.float32(1 << (bps - 1))
    return (x.astype(np.float32) / scale), sample_rate


_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                13: 8192, 14: 16384, 15: 32768}


def _decode_frame(payload: bytes, pos: int, channels: int, bps: int,
                  sample_rate: int):
    start = pos
    if payload[pos] != 0xFF or (payload[pos + 1] & 0xFC) != 0xF8:
        raise ValueError("bad FLAC frame sync")
    if payload[pos + 1] & 0x01:
        raise NotImplementedError("variable-blocksize frames")
    bs_code = payload[pos + 2] >> 4
    sr_code = payload[pos + 2] & 0xF
    ca = payload[pos + 3] >> 4
    ss_code = (payload[pos + 3] >> 1) & 0x7
    pos += 4
    # coded frame number: skip UTF-8-style continuation bytes
    first = payload[pos]
    n_follow = 0
    while first & (0x80 >> n_follow) and n_follow < 7:
        n_follow += 1
    pos += 1 + max(0, n_follow - 1)
    if bs_code == 0b0110:
        bs = payload[pos] + 1
        pos += 1
    elif bs_code == 0b0111:
        bs = struct.unpack(">H", payload[pos : pos + 2])[0] + 1
        pos += 2
    elif bs_code in _BLOCK_SIZES:
        bs = _BLOCK_SIZES[bs_code]
    else:
        raise ValueError(f"reserved block size code {bs_code}")
    if sr_code == 0b1100:
        pos += 1
    elif sr_code in (0b1101, 0b1110):
        pos += 2
    if ss_code == 0b000:
        fbps = bps
    elif ss_code == 0b001:
        fbps = 8
    elif ss_code == 0b100:
        fbps = 16
    else:
        raise NotImplementedError(f"sample size code {ss_code} (subset: 8/16)")
    if _crc8(payload[start:pos]) != payload[pos]:
        raise ValueError("FLAC frame header CRC-8 mismatch")
    pos += 1

    if ca < 8:
        n_ch = ca + 1
        side_bits = [0] * n_ch
    elif ca in (8, 9, 10):
        n_ch = 2
        side_bits = [0, 1] if ca in (8, 10) else [1, 0]
    else:
        raise ValueError(f"reserved channel assignment {ca}")
    if n_ch != channels:
        raise ValueError("frame channel count != STREAMINFO")

    rd = _BitReader(payload, pos)
    raw = [_decode_subframe(rd, bs, fbps + side_bits[c]) for c in range(n_ch)]
    rd.align()
    if _crc16(payload[start : rd.byte]) != struct.unpack(
        ">H", payload[rd.byte : rd.byte + 2]
    )[0]:
        raise ValueError("FLAC frame CRC-16 mismatch")
    pos = rd.byte + 2

    if ca == 8:     # left/side: side = L - R
        left, side = raw
        raw = [left, left - side]
    elif ca == 9:   # right/side
        side, right = raw
        raw = [right + side, right]
    elif ca == 10:  # mid/side
        mid, side = raw
        mid2 = (mid << 1) | (side & 1)
        raw = [(mid2 + side) >> 1, (mid2 - side) >> 1]
    return pos, raw


def _decode_subframe(rd: _BitReader, bs: int, bps: int) -> np.ndarray:
    if rd.read(1):
        raise ValueError("subframe padding bit set")
    stype = rd.read(6)
    wasted = 0
    if rd.read(1):
        wasted = rd.read_unary() + 1
        bps -= wasted
    if stype == 0:
        x = np.full(bs, rd.read_signed(bps), dtype=np.int64)
    elif stype == 1:
        x = np.array([rd.read_signed(bps) for _ in range(bs)], dtype=np.int64)
    elif 8 <= stype <= 12:
        order = stype - 8
        warm = [rd.read_signed(bps) for _ in range(order)]
        res = _decode_residual(rd, bs, order)
        x = np.empty(bs, dtype=np.int64)
        x[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, bs):
            pred = 0
            for j, cf in enumerate(coefs):
                pred += cf * x[i - 1 - j]
            x[i] = res[i - order] + pred
    elif stype >= 32:
        order = stype - 31
        warm = [rd.read_signed(bps) for _ in range(order)]
        prec = rd.read(4)
        if prec == 15:
            raise ValueError("invalid LPC precision code 15")
        prec += 1
        shift = rd.read_signed(5)
        if shift < 0:
            # the spec reserves negative shifts; reference decoders reject
            raise ValueError("negative LPC shift")
        coefs = np.array([rd.read_signed(prec) for _ in range(order)],
                         dtype=np.int64)
        res = _decode_residual(rd, bs, order)
        x = np.empty(bs, dtype=np.int64)
        x[:order] = warm
        for i in range(order, bs):
            pred = int(coefs @ x[i - order : i][::-1])
            x[i] = res[i - order] + (pred >> shift)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    return x << wasted


def _decode_residual(rd: _BitReader, bs: int, order: int) -> np.ndarray:
    method = rd.read(2)
    if method > 1:
        raise ValueError(f"reserved residual method {method}")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    po = rd.read(4)
    nparts = 1 << po
    if bs % nparts:
        raise ValueError("block size not divisible by partition count")
    out = np.empty(bs - order, dtype=np.int64)
    w = 0
    for p in range(nparts):
        cnt = bs // nparts - (order if p == 0 else 0)
        r = rd.read(pbits)
        if r == escape:
            raw_bits = rd.read(5)
            for _ in range(cnt):
                out[w] = rd.read_signed(raw_bits) if raw_bits else 0
                w += 1
        else:
            for _ in range(cnt):
                q = rd.read_unary()
                v = (q << r) | (rd.read(r) if r else 0)
                out[w] = _unzigzag(v)
                w += 1
    return out
