"""Dependency-free baseline JPEG decoder + 4:4:4/grayscale encoder.

Baseline sequential JPEG (ITU-T T.81) needs no codec library: Huffman
tables ship inside the file, the IDCT is an 8x8 matrix product, and the
entropy stream is bit-serial — all decodable with pure Python/numpy,
completing the media matrix next to WAV/BMP/PNG/FLAC.

Decoder coverage (refuses loudly outside it):
* SOF0 (baseline), SOF1 (extended sequential) and SOF2 (progressive)
  8-bit frames — progressive covers spectral selection AND successive
  approximation: DC first/refinement scans, AC first scans with EOBn
  run codes, AC refinement scans with correction bits (T.81 G.2)
* grayscale and 3-component YCbCr with ANY sampling factors
  (4:4:4, 4:2:2, 4:2:0, ... — chroma upsampled by pixel replication)
* multiple DQT/DHT segments, 8- and 16-bit quant tables
* restart intervals (DRI + RSTn markers, DC predictor reset; in
  progressive scans they also reset the EOB run)
* byte-stuffed entropy stream (FF 00), APPn/COM skipped

Out of subset: arithmetic-coded (SOF9+) frames, hierarchical (SOF3+),
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
    RSTn awareness (resync + DC reset is the caller's job).

    ``stop_any_marker`` (progressive scans): ANY marker ends the
    entropy data — pad with 1-bits and leave it unconsumed so the
    caller's marker loop picks up the next segment (a multi-scan file
    legitimately follows scan data with DHT/SOS/EOI). Baseline keeps
    the strict behavior: a non-RST marker mid-scan is corruption."""

    def __init__(self, data: bytes, pos: int, stop_any_marker: bool = False):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.stop_any_marker = stop_any_marker

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
                elif (0xD0 <= nxt <= 0xD7 or nxt == 0xD9
                      or self.stop_any_marker):
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
    """Decode a baseline or progressive JPEG; returns uint8 (h, w) for
    grayscale or (h, w, 3) RGB (BT.601 YCbCr transform, chroma
    replicated)."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart = 0
    prog = None  # progressive state: per-component coefficient arrays
    n_scans = 0
    while pos < len(payload):
        if pos + 1 >= len(payload):
            raise ValueError("truncated JPEG stream")
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
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 sequential, SOF2 progressive
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
            if m == 0xC2:
                prog = _ProgState(frame)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"JPEG frame type FF{m:02X} — "
                                      "sequential/progressive Huffman only")
        elif m == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            sel = {}
            order = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c : 3 + 2 * c]
                sel[cs] = (tt >> 4, tt & 0xF)
                order.append(cs)
            if prog is None:
                return _decode_scan(payload, pos + seg_len, frame, sel, qt,
                                    huff, restart)
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            pos = prog.decode_scan(payload, pos + seg_len, order, sel, huff,
                                   restart, ss, se, ahal >> 4, ahal & 0xF)
            n_scans += 1
            continue
        pos += seg_len
    if prog is not None and n_scans:
        return prog.render(qt)
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
    return _color_compose(out_planes)


def _color_compose(out_planes: list) -> np.ndarray:
    """Float component planes (already cropped) -> uint8 gray or RGB."""
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def _next_marker(payload: bytes, pos: int) -> int:
    """Position of the next real marker at/after pos (skips stuffed
    FF 00 bytes, stray RSTn, and FF fill bytes)."""
    while pos < len(payload):
        if payload[pos] == 0xFF:
            nxt = payload[pos + 1] if pos + 1 < len(payload) else 0xD9
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            if nxt == 0xFF:
                pos += 1
                continue
            return pos
        pos += 1
    return pos


class _ProgState:
    """Coefficient accumulator for progressive (SOF2) decoding: each SOS
    updates per-component zigzag-order coefficient arrays in place;
    ``render`` runs dequant + IDCT once after the last scan (T.81 G.2).

    Scan kinds (G.1.2): DC first (Huffman diff, stored << Al), DC
    refinement (one appended bit per block), AC first (band Ss..Se with
    EOBn run-length codes), AC refinement (correction bits for
    already-nonzero coefficients, magnitude-1 insertions)."""

    def __init__(self, frame: dict):
        self.frame = frame
        comps = frame["comps"]
        self.hmax = max(c["h"] for c in comps)
        self.vmax = max(c["v"] for c in comps)
        self.mcux = -(-frame["w"] // (8 * self.hmax))
        self.mcuy = -(-frame["h"] // (8 * self.vmax))
        self.coef: list[np.ndarray] = []
        self.nblocks: list[tuple[int, int]] = []
        for c in comps:
            cw = -(-frame["w"] * c["h"] // self.hmax)
            ch = -(-frame["h"] * c["v"] // self.vmax)
            self.nblocks.append((-(-ch // 8), -(-cw // 8)))
            self.coef.append(np.zeros(
                (self.mcuy * c["v"], self.mcux * c["h"], 64), dtype=np.int64))
        self.eobrun = 0

    def decode_scan(self, payload, pos, order, sel, huff, restart,
                    ss, se, ah, al) -> int:
        comps = self.frame["comps"]
        idx = {c["id"]: i for i, c in enumerate(comps)}
        rd = _ScanReader(payload, pos, stop_any_marker=True)
        self.eobrun = 0
        pred = {cid: 0 for cid in order}
        if not 0 <= ss <= se <= 63:
            raise ValueError(f"invalid spectral band Ss={ss} Se={se}")
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0 (T.81 G.1.1.1)")

        def table(cls, tid):
            if (cls, tid) not in huff:
                raise ValueError(
                    f"scan references undefined {'AC' if cls else 'DC'} "
                    f"Huffman table {tid}")
            return huff[(cls, tid)]

        if len(order) > 1:
            if ss != 0:
                raise ValueError("interleaved progressive scan must be DC-only")
            n_mcu = self.mcux * self.mcuy
            # refinement DC scans read raw bits: the table is unused
            dtabs = {cid: table(0, sel[cid][0]) if ah == 0 else None
                     for cid in order}
            for mi in range(n_mcu):
                if restart and mi and mi % restart == 0:
                    rd.sync_restart()
                    pred = {cid: 0 for cid in order}
                my, mx = divmod(mi, self.mcux)
                for cid in order:
                    ci = idx[cid]
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = self.coef[ci][my * c["v"] + by,
                                                mx * c["h"] + bx]
                            pred[cid] = self._dc(rd, blk, dtabs[cid],
                                                 pred[cid], ah, al)
        else:
            cid = order[0]
            ci = idx[cid]
            bh, bw = self.nblocks[ci]
            dtab = table(0, sel[cid][0]) if ss == 0 and ah == 0 else None
            atab = table(1, sel[cid][1]) if ss > 0 else None
            for bi in range(bh * bw):
                if restart and bi and bi % restart == 0:
                    rd.sync_restart()
                    pred[cid] = 0
                    self.eobrun = 0
                by, bx = divmod(bi, bw)
                blk = self.coef[ci][by, bx]
                if ss == 0:
                    pred[cid] = self._dc(rd, blk, dtab, pred[cid], ah, al)
                elif ah == 0:
                    self._ac_first(rd, blk, atab, ss, se, al)
                else:
                    self._ac_refine(rd, blk, atab, ss, se, al)
        return _next_marker(payload, rd.pos)

    @staticmethod
    def _dc(rd, blk, dtab, pred: int, ah: int, al: int) -> int:
        if ah == 0:
            t = rd.decode(dtab)
            pred += _extend(rd.receive(t), t)
            blk[0] = pred << al
        elif rd.read_bit():
            blk[0] |= 1 << al  # two's-complement OR is the spec behavior
        return pred

    def _ac_first(self, rd, blk, atab, ss, se, al):
        if self.eobrun > 0:
            self.eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = rd.decode(atab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:  # EOBn: run of 2^r + receive(r) all-done blocks
                    self.eobrun = (1 << r) - 1
                    if r:
                        self.eobrun += rd.receive(r)
                    break
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC index overflow in progressive scan")
            blk[k] = _extend(rd.receive(s), s) << al
            k += 1

    def _ac_refine(self, rd, blk, atab, ss, se, al):
        p1 = 1 << al
        m1 = -1 << al
        k = ss
        if self.eobrun == 0:
            while k <= se:
                rs = rd.decode(atab)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r < 15:
                        self.eobrun = 1 << r
                        if r:
                            self.eobrun += rd.receive(r)
                        break
                    newval = 0  # ZRL: skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("AC refinement magnitude != 1")
                    newval = p1 if rd.read_bit() else m1
                # advance over the run: zero-history coefs consume the run
                # count, already-nonzero coefs consume a correction bit
                while k <= se:
                    if blk[k]:
                        if rd.read_bit() and not (blk[k] & p1):
                            blk[k] += p1 if blk[k] > 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    blk[k] = newval
                k += 1
        if self.eobrun > 0:
            while k <= se:  # EOB: correction bits only, through band end
                if blk[k]:
                    if rd.read_bit() and not (blk[k] & p1):
                        blk[k] += p1 if blk[k] > 0 else m1
                k += 1
            self.eobrun -= 1

    def render(self, qt: dict) -> np.ndarray:
        frame = self.frame
        out_planes = []
        for ci, c in enumerate(frame["comps"]):
            dq = (self.coef[ci] * qt[c["tq"]]).astype(np.float64)
            nat = np.zeros_like(dq)
            nat[..., ZIGZAG] = dq
            bv, bh = nat.shape[:2]
            x = nat.reshape(bv, bh, 8, 8)
            px = np.einsum("ij,abjk,kl->abil", _C.T, x, _C) + 128.0
            plane = px.transpose(0, 2, 1, 3).reshape(bv * 8, bh * 8)
            if c["h"] != self.hmax or c["v"] != self.vmax:
                plane = np.repeat(
                    np.repeat(plane, self.vmax // c["v"], axis=0),
                    self.hmax // c["h"], axis=1)
            out_planes.append(plane[: frame["h"], : frame["w"]])
        return _color_compose(out_planes)


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


def _emit_coded(wtr: _BitWriterJ, tab: dict, sym: int, v: int, s: int):
    """Huffman code for ``sym`` followed by the s magnitude bits of v
    (T.81 F.1.2.2.1 two's-complement-minus-one convention)."""
    ln, code = tab[sym]
    wtr.write(code, ln)
    if s:
        wtr.write(v if v >= 0 else v + (1 << s) - 1, s)


def _emit_rst(wtr: _BitWriterJ, counter: int):
    """Byte-align and append RSTn (n = counter mod 8)."""
    wtr.flush()
    wtr.out.extend(bytes([0xFF, 0xD0 + (counter & 7)]))


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255)


def write_jpeg(img: np.ndarray, quality: int = 90, subsample: bool = False,
               restart_interval: int = 0, progressive: bool = False) -> bytes:
    """Encode uint8 (h, w) grayscale or (h, w, 3) RGB as baseline JPEG
    (standard Annex K tables scaled by ``quality``). ``subsample``:
    False = 4:4:4; True or "420" = 2x2-averaged chroma (the dominant
    real-world layout); "422" = horizontal-only; "440" = vertical-only
    — the asymmetric layouts exist so decoder tests cover non-square
    sampling-factor paths with in-repo streams. ``restart_interval``
    emits DRI + RSTn markers every N MCUs. ``progressive=True`` emits a
    SOF2 multi-scan stream with the standard script shape (DC first at
    Al=1, split AC first scans at Al=2, full-band AC refinements, DC
    refinement) so every progressive scan kind round-trips against the
    decoder."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    sub_modes = {False: None, True: (2, 2), "420": (2, 2),
                 "422": (2, 1), "440": (1, 2)}
    if subsample not in sub_modes:
        raise ValueError(f"subsample must be one of {list(sub_modes)}, "
                         f"got {subsample!r}")
    sub = sub_modes[subsample]
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
    ysamp = 0x11 if (gray or sub is None) else (sub[0] << 4) | sub[1]
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, ysamp if c == 0 else 0x11, 0 if c == 0 else 1])
    seg(0xC2 if progressive else 0xC0, sof)
    tables = ((0, 0, _DC_LUM), (1, 0, _AC_LUM), (0, 1, _DC_CHR), (1, 1, _AC_CHR))
    for tc, th, (bits, vals) in tables[: 2 if nc == 1 else 4]:
        seg(0xC4, bytes([tc << 4 | th] + bits) + bytes(vals))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    if not progressive:
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
        if sub:
            # pad to the decimation grid, then box-average the chroma
            fh, fv = sub
            he, we = -(-h // fv) * fv, -(-w // fh) * fh
            def pad_grid(p):
                pp = np.empty((he, we))
                pp[:h, :w] = p
                if he > h:
                    pp[h:, :w] = p[-1:, :]
                if we > w:
                    pp[:, w:] = pp[:, w - 1 : w]
                return pp
            cb = pad_grid(cb).reshape(he // fv, fv, we // fh, fh).mean(axis=(1, 3))
            cr = pad_grid(cr).reshape(he // fv, fv, we // fh, fh).mean(axis=(1, 3))
            samps = [(fh, fv), (1, 1), (1, 1)]
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

    if progressive:
        _emit_progressive(out, seg, padded, samps, qts, enc_dc, enc_ac,
                          h, w, hmax, vmax, mcux, mcuy, restart_interval)
        out.extend(b"\xFF\xD9")
        return bytes(out)

    wtr = _BitWriterJ()
    pred = [0] * len(comp_planes)
    n_mcu = mcux * mcuy

    def emit_block(ci, blk):
        t_id = 0 if ci == 0 else 1
        X = _C @ blk @ _C.T
        zz = np.round(X.reshape(-1)[ZIGZAG] / qts[ci]).astype(np.int64)
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        _emit_coded(wtr, enc_dc[t_id], _category(diff), diff, _category(diff))
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
                _emit_coded(wtr, enc_ac[t_id], 0xF0, 0, 0)
                run -= 16
            s = _category(v)
            _emit_coded(wtr, enc_ac[t_id], (run << 4) | s, v, s)
            run = 0
        if last < 63:
            _emit_coded(wtr, enc_ac[t_id], 0x00, 0, 0)

    for mi in range(n_mcu):
        if restart_interval and mi and mi % restart_interval == 0:
            _emit_rst(wtr, mi // restart_interval - 1)
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


def _emit_progressive(out, seg, padded, samps, qts, enc_dc, enc_ac,
                      h, w, hmax, vmax, mcux, mcuy, restart_interval):
    """Emit the SOS segments + entropy data of a progressive stream with
    the standard successive-approximation script (the libjpeg default
    shape): DC first at Al=1; AC first scans split 1-5 / 6-63 at Al=2;
    AC refinements Ah=2->Al=1 then Ah=1->Al=0 over the full band; DC
    refinement last. EOB runs are not accumulated across blocks (every
    block ends its own code sequence), which keeps the Annex K Huffman
    tables sufficient — EOBn symbols for n>0 never occur."""
    nc = len(padded)
    n_mcu = mcux * mcuy

    # quantized zigzag-order coefficient grids, one per component
    coefz = []
    nblocks = []
    for ci, (p, (sh, sv)) in enumerate(zip(padded, samps)):
        ph, pw = p.shape
        blocks = p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        x = np.einsum("ij,abjk,kl->abil", _C, blocks, _C.T)
        zz = x.reshape(ph // 8, pw // 8, 64)[..., ZIGZAG]
        coefz.append(np.round(zz / qts[ci]).astype(np.int64))
        cw = -(-w * sh // hmax)
        ch2 = -(-h * sv // vmax)
        nblocks.append((-(-ch2 // 8), -(-cw // 8)))

    def sos_header(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for ci in comp_ids:
            tid = 0 if ci == 0 else 1
            body += bytes([ci + 1, (tid << 4) | tid])
        body += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, body)

    def dc_scan(al, refine):
        sos_header(list(range(nc)), 0, 0, al + 1 if refine else 0, al)
        wtr = _BitWriterJ()
        pred = [0] * nc
        rst = 0
        for mi in range(n_mcu):
            if restart_interval and mi and mi % restart_interval == 0:
                _emit_rst(wtr, rst)
                rst += 1
                pred = [0] * nc
            my, mx = divmod(mi, mcux)
            for ci in range(nc):
                sh, sv = samps[ci]
                tab = enc_dc[0 if ci == 0 else 1]
                for by in range(sv):
                    for bx in range(sh):
                        dc = int(coefz[ci][my * sv + by, mx * sh + bx, 0])
                        if refine:
                            wtr.write((dc >> al) & 1, 1)
                            continue
                        val = dc >> al  # DC point transform: arithmetic shift
                        diff = val - pred[ci]
                        pred[ci] = val
                        _emit_coded(wtr, tab, _category(diff), diff,
                                    _category(diff))
        wtr.flush()
        out.extend(wtr.out)

    def ac_first_scan(ci, ss, se, al):
        sos_header([ci], ss, se, 0, al)
        wtr = _BitWriterJ()
        bh_c, bw_c = nblocks[ci]
        tab = enc_ac[0 if ci == 0 else 1]
        rst = 0
        for bi in range(bh_c * bw_c):
            if restart_interval and bi and bi % restart_interval == 0:
                _emit_rst(wtr, rst)
                rst += 1
            by, bx = divmod(bi, bw_c)
            raw = coefz[ci][by, bx, ss : se + 1]
            band = np.sign(raw) * (np.abs(raw) >> al)  # AC: trunc toward 0
            run = 0
            for v in band:
                v = int(v)
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    _emit_coded(wtr, tab, 0xF0, 0, 0)
                    run -= 16
                s = _category(v)
                _emit_coded(wtr, tab, (run << 4) | s, v, s)
                run = 0
            if run:  # trailing zeros: EOB (run length 1, no accumulation)
                _emit_coded(wtr, tab, 0x00, 0, 0)
        wtr.flush()
        out.extend(wtr.out)

    def ac_refine_scan(ci, ss, se, ah, al):
        sos_header([ci], ss, se, ah, al)
        wtr = _BitWriterJ()
        bh_c, bw_c = nblocks[ci]
        tab = enc_ac[0 if ci == 0 else 1]
        rst = 0
        for bi in range(bh_c * bw_c):
            if restart_interval and bi and bi % restart_interval == 0:
                _emit_rst(wtr, rst)
                rst += 1
            by, bx = divmod(bi, bw_c)
            raw = coefz[ci][by, bx, ss : se + 1]
            absv = np.abs(raw) >> al
            newly = np.nonzero(absv == 1)[0]
            eob_idx = int(newly[-1]) if newly.size else -1
            r = 0
            br = []  # correction bits buffered since the last emitted code
            for k in range(absv.size):
                t = int(absv[k])
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob_idx:
                    _emit_coded(wtr, tab, 0xF0, 0, 0)
                    r -= 16
                    for b in br:
                        wtr.write(b, 1)
                    br = []
                if t > 1:  # already significant: buffer its next bit
                    br.append(t & 1)
                    continue
                _emit_coded(wtr, tab, (r << 4) | 1,  # newly significant
                            1 if raw[k] > 0 else 0, 1)
                for b in br:
                    wtr.write(b, 1)
                br = []
                r = 0
            if r or br:
                ln, code = tab[0x00]  # EOB0 + trailing correction bits
                wtr.write(code, ln)
                for b in br:
                    wtr.write(b, 1)
        wtr.flush()
        out.extend(wtr.out)

    dc_scan(1, refine=False)
    for ci in range(nc):
        ac_first_scan(ci, 1, 5, 2)
    for ci in range(nc):
        ac_first_scan(ci, 6, 63, 2)
    for ci in range(nc):
        ac_refine_scan(ci, 1, 63, 2, 1)
    for ci in range(nc):
        ac_refine_scan(ci, 1, 63, 1, 0)
    dc_scan(0, refine=True)
