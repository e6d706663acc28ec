"""Dependency-free baseline JPEG decoder + 4:4:4/grayscale encoder.

Baseline sequential JPEG (ITU-T T.81) needs no codec library: Huffman
tables ship inside the file, the IDCT is an 8x8 matrix product, and the
entropy stream is bit-serial — all decodable with pure Python/numpy,
completing the media matrix next to WAV/BMP/PNG/FLAC.

Decoder coverage (refuses loudly outside it):
* SOF0 (baseline) and SOF1 (extended sequential, 8-bit) frames
* grayscale and 3-component YCbCr with ANY sampling factors
  (4:4:4, 4:2:2, 4:2:0, ... — chroma upsampled by pixel replication)
* multiple DQT/DHT segments, 8- and 16-bit quant tables
* restart intervals (DRI + RSTn markers, DC predictor reset)
* byte-stuffed entropy stream (FF 00), APPn/COM skipped

Out of subset: progressive (SOF2) and arithmetic-coded (SOF9+) frames,
12-bit precision — each raises NotImplementedError naming the construct.

The encoder emits spec-valid baseline streams (standard Annex K quant
tables scaled by a quality factor, standard Annex K Huffman tables,
grayscale or 4:4:4 color) so tests can round-trip: JPEG is lossy, so
round-trips assert bounded pixel error at high quality, while the
hand-crafted single-block fixtures in the tests pin the Huffman /
dequant / zigzag / IDCT pipeline exactly.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# orthonormal 8-point DCT-II basis; IDCT(X) = C.T @ X @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5)

# Annex K luminance/chrominance quant tables (quality 50 reference)
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K typical Huffman tables: (bits[1..16], values)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _build_decode_table(bits, values):
    """(bits, values) -> {(length, code): symbol} per T.81 C.2."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits, values):
    dec = _build_decode_table(bits, values)
    return {sym: (ln, code) for (ln, code), sym in dec.items()}


def _extend(v: int, t: int) -> int:
    # T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


class _ScanReader:
    """Bit reader over the entropy-coded segment: FF 00 unstuffing,
    RSTn awareness (resync + DC reset is the caller's job)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        while self.n <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0xFF  # spec: pad with 1s
                self.n += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                    # marker ahead: pad with 1-bits, do not consume
                    self.acc = (self.acc << 8) | 0xFF
                    self.n += 8
                    continue
                else:
                    raise ValueError(f"unexpected marker FF{nxt:02X} in scan")
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, t: int) -> int:
        v = 0
        for _ in range(t):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table) -> int:
        ln, code = 0, 0
        for _ in range(16):
            code = (code << 1) | self.read_bit()
            ln += 1
            if (ln, code) in table:
                return table[(ln, code)]
        raise ValueError("invalid Huffman code in scan")

    def sync_restart(self) -> None:
        """Skip to just after the next RSTn marker, byte-aligned."""
        self.acc = 0
        self.n = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


def parse_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG; returns uint8 (h, w) for grayscale or
    (h, w, 3) RGB (BT.601 YCbCr transform, chroma replicated)."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        m = payload[pos + 1]
        pos += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:
            break
        (seg_len,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seg_len]
        if m == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    tab = np.frombuffer(body, np.uint8, 64, i).astype(np.int64)
                    i += 64
                else:
                    tab = np.frombuffer(body, ">u2", 64, i).astype(np.int64)
                    i += 128
                qt[tq] = tab
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                i += 17 + nv
        elif m in (0xC0, 0xC1):  # SOF0/SOF1 baseline/extended sequential
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG (subset: 8)")
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif m == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2) — baseline only")
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG frame type FF{m:02X} — baseline only")
        elif m == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            sel = {}
            for c in range(ns):
                cs, tt = body[1 + 2 * c : 3 + 2 * c]
                sel[cs] = (tt >> 4, tt & 0xF)
            return _decode_scan(payload, pos + seg_len, frame, sel, qt, huff, restart)
        pos += seg_len
    raise ValueError("no scan found")


def _decode_scan(payload, pos, frame, sel, qt, huff, restart):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64))
    rd = _ScanReader(payload, pos)
    pred = [0] * len(comps)
    n_mcu = mcux * mcuy
    for mi in range(n_mcu):
        if restart and mi and mi % restart == 0:
            rd.sync_restart()
            pred = [0] * len(comps)
        my, mx = divmod(mi, mcux)
        for ci, c in enumerate(comps):
            dc_t, ac_t = sel[c["id"]]
            dct = huff[(0, dc_t)]
            act = huff[(1, ac_t)]
            q = qt[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    coef = np.zeros(64, dtype=np.int64)
                    t = rd.decode(dct)
                    diff = _extend(rd.receive(t), t)
                    pred[ci] += diff
                    coef[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = rd.decode(act)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC index overflow")
                        coef[k] = _extend(rd.receive(s), s)
                        k += 1
                    blk = np.zeros(64, dtype=np.float64)
                    blk[ZIGZAG] = coef * q
                    px = _C.T @ blk.reshape(8, 8) @ _C + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])
    if len(comps) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encode

class _BitWriterJ:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, ln: int):
        self.acc = (self.acc << ln) | (code & ((1 << ln) - 1))
        self.n += ln
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255)


def write_jpeg(img: np.ndarray, quality: int = 90, subsample: bool = False,
               restart_interval: int = 0) -> bytes:
    """Encode uint8 (h, w) grayscale or (h, w, 3) RGB as baseline JPEG
    (standard Annex K tables scaled by ``quality``). ``subsample=True``
    uses 4:2:0 chroma (2x2-averaged, the dominant real-world layout);
    ``restart_interval`` emits DRI + RSTn markers every N MCUs — both
    exist so decoder tests cover those paths with in-repo streams."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql = _scaled_q(_QL, quality)
    qc = _scaled_q(_QC, quality)

    out = bytearray(b"\xFF\xD8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body)

    # DQT stores the table in zigzag order; _QL/_QC are natural order
    qlz, qcz = ql[ZIGZAG], qc[ZIGZAG]
    seg(0xDB, bytes([0]) + bytes(qlz.tolist()))
    if not gray:
        seg(0xDB, bytes([1]) + bytes(qcz.tolist()))
    nc = 1 if gray else 3
    ysamp = 0x22 if (subsample and not gray) else 0x11
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, ysamp if c == 0 else 0x11, 0 if c == 0 else 1])
    seg(0xC0, sof)
    tables = ((0, 0, _DC_LUM), (1, 0, _AC_LUM), (0, 1, _DC_CHR), (1, 1, _AC_CHR))
    for tc, th, (bits, vals) in tables[: 2 if nc == 1 else 4]:
        seg(0xC4, bytes([tc << 4 | th] + bits) + bytes(vals))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    if gray:
        comp_planes = [img.astype(np.float64) - 128.0]
        qts = [qlz]
        samps = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]
        if subsample:
            # pad to even dims, then 2x2 box-average the chroma planes
            he, we = h + (h & 1), w + (w & 1)
            def pad_even(p):
                pp = np.empty((he, we))
                pp[:h, :w] = p
                if he > h:
                    pp[h:, :w] = p[-1:, :]
                if we > w:
                    pp[:, w:] = pp[:, w - 1 : w]
                return pp
            cb = pad_even(cb).reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr = pad_even(cr).reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
        comp_planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qts = [qlz, qcz, qcz]

    enc_dc = [_build_encode_table(*_DC_LUM), _build_encode_table(*_DC_CHR)]
    enc_ac = [_build_encode_table(*_AC_LUM), _build_encode_table(*_AC_CHR)]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # pad every component plane to its own MCU grid, edge-replicated
    padded = []
    for p, (sh, sv) in zip(comp_planes, samps):
        ph, pw = mcuy * 8 * sv, mcux * 8 * sh
        pp = np.empty((ph, pw))
        ch_, cw_ = p.shape
        pp[:ch_, :cw_] = p
        if ph > ch_:
            pp[ch_:, :cw_] = p[-1:, :]
        if pw > cw_:
            pp[:, cw_:] = pp[:, cw_ - 1 : cw_]
        padded.append(pp)

    wtr = _BitWriterJ()
    pred = [0] * len(comp_planes)
    n_mcu = mcux * mcuy

    def emit_block(ci, blk):
        t_id = 0 if ci == 0 else 1
        X = _C @ blk @ _C.T
        zz = np.round(X.reshape(-1)[ZIGZAG] / qts[ci]).astype(np.int64)
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        t = _category(diff)
        ln, code = enc_dc[t_id][t]
        wtr.write(code, ln)
        if t:
            wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        last = 63
        while last > 0 and zz[last] == 0:
            last -= 1
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = enc_ac[t_id][0xF0]
                wtr.write(code, ln)
                run -= 16
            s = _category(v)
            ln, code = enc_ac[t_id][(run << 4) | s]
            wtr.write(code, ln)
            wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            ln, code = enc_ac[t_id][0x00]
            wtr.write(code, ln)

    for mi in range(n_mcu):
        if restart_interval and mi and mi % restart_interval == 0:
            wtr.flush()
            out_rst = 0xD0 + ((mi // restart_interval - 1) & 7)
            wtr.out.extend(bytes([0xFF, out_rst]))
            pred = [0] * len(comp_planes)
        my, mx = divmod(mi, mcux)
        for ci, (p, (sh, sv)) in enumerate(zip(padded, samps)):
            for by in range(sv):
                for bx in range(sh):
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh + bx) * 8
                    emit_block(ci, p[y0 : y0 + 8, x0 : x0 + 8])
    wtr.flush()
    out.extend(wtr.out)
    out.extend(b"\xFF\xD9")
    return bytes(out)
