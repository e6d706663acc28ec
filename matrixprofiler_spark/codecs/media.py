"""Real, dependency-free media codecs for the multimodal pipeline: WAV-PCM
and BMP are plain struct-and-numpy formats, so the decode step of
operators/multimodal.py is REAL for them (no PIL/libsndfile in this
environment; other formats keep the declared stub).

Formats supported:
* WAV: RIFF/WAVE, ``fmt `` chunk with PCM (format 1), 8- or 16-bit,
  any channel count; chunk walker skips unknown chunks (LIST, fact, ...).
* BMP: BITMAPFILEHEADER + BITMAPINFOHEADER (40-byte DIB), 24-bit
  uncompressed, bottom-up or top-down rows, 4-byte row padding.
* PNG: 8-bit non-interlaced, color types 0/2/3/4/6, all five row
  filters, CRC-checked — DEFLATE comes from the stdlib ``zlib``, so the
  decode is fully dependency-free (16-bit / Adam7 refuse loudly).

Writers for both are provided so tests can round-trip deterministic
fixtures byte-exactly.
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------------ WAV

def write_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal PCM16 WAV writer. ``samples``: int16 array, 1-D (mono) or
    (n, channels)."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a PCM WAV; returns (float32 samples in [-1, 1), shape
    (n, channels), sample_rate). 16-bit -> x/32768, 8-bit unsigned ->
    (x-128)/128 — exact float32 conversions."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, sr, _, _, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(f"WAV format {audio_format} (only PCM=1)")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / np.float32(32768.0)
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32)
             - np.float32(128.0)) / np.float32(128.0)
    else:
        raise NotImplementedError(f"{bits}-bit PCM (only 8/16)")
    n = x.size // ch
    return x[: n * ch].reshape(n, ch), sr


# ------------------------------------------------------------------ BMP

def write_bmp(img: np.ndarray) -> bytes:
    """Minimal 24-bit bottom-up BMP writer. ``img``: uint8 (h, w, 3) RGB."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("write_bmp expects (h, w, 3) RGB")
    row = w * 3
    pad = (-row) % 4
    bgr = img[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    rows = np.zeros((h, row + pad), dtype=np.uint8)
    rows[:, :row] = bgr.reshape(h, row)
    data = rows.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    off = 14 + 40
    head = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    return head + dib + data


def parse_bmp(payload: bytes) -> np.ndarray:
    """Parse a 24-bit uncompressed BMP; returns uint8 (h, w, 3) RGB.
    Handles bottom-up (height > 0) and top-down (height < 0) layouts."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    dib_size, w, h = struct.unpack_from("<Iii", payload, 14)
    if dib_size < 40:
        raise NotImplementedError(f"DIB header size {dib_size}")
    _, bpp, comp = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"{bpp}-bit compression={comp} (only 24-bit raw)")
    top_down = h < 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    raw = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=off)
    rows = raw.reshape(h, stride)[:, :row].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# ------------------------------------------------------------------ PNG

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# channels per PNG color type (8-bit only): 0 gray, 2 RGB, 3 palette,
# 4 gray+alpha, 6 RGBA
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def write_png(img: np.ndarray, filter_type: int | str = 0,
              palette: np.ndarray | None = None) -> bytes:
    """Minimal 8-bit non-interlaced PNG writer (tests' fixture source —
    same role as write_wav/write_bmp). ``img``: uint8 (h, w) gray,
    (h, w, 2) gray+alpha, (h, w, 3) RGB, (h, w, 4) RGBA; with
    ``palette`` (uint8 (n, 3)), img must be (h, w) palette indices.
    ``filter_type``: per-row filter byte 0..4, or "mixed" for row y
    using filter y % 5 — all five filter paths get exercised."""
    import zlib

    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    if palette is not None:
        color_type, ch = 3, 1
        raw = img.reshape(h, w)
    elif img.ndim == 2:
        color_type, ch = 0, 1
        raw = img
    else:
        ch = img.shape[2]
        color_type = {2: 4, 3: 2, 4: 6}[ch]
        raw = img
    rows = raw.reshape(h, w * ch).astype(np.int32)
    stride = w * ch
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = (y % 5) if filter_type == "mixed" else int(filter_type)
        cur = rows[y]
        a = np.concatenate([np.zeros(ch, dtype=np.int32), cur[:-ch]]) \
            if stride > ch else np.zeros(stride, dtype=np.int32)
        c = np.concatenate([np.zeros(ch, dtype=np.int32), prev[:-ch]]) \
            if stride > ch else np.zeros(stride, dtype=np.int32)
        if ft == 0:
            f = cur
        elif ft == 1:
            f = cur - a
        elif ft == 2:
            f = cur - prev
        elif ft == 3:
            f = cur - ((a + prev) >> 1)
        elif ft == 4:
            p = a + prev - c
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a,
                            np.where(pb <= pc, prev, c))
            f = cur - pred
        else:
            raise ValueError(f"filter {ft}")
        out.append(ft)
        out.extend((f & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        body += _png_chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes())
    body += _png_chunk(b"IDAT", zlib.compress(bytes(out)))
    body += _png_chunk(b"IEND", b"")
    return body


def parse_png(payload: bytes) -> np.ndarray:
    """Parse a PNG (color types 0/2/3/4/6, bit depths 1/2/4/8/16, all
    five row filters, sequential or Adam7-interlaced, CRC-checked).
    Returns uint8 (h, w) for gray, else (h, w, channels): sub-byte
    depths sample-scale to 0..255, 16-bit reduces by the rounded
    255/65535 scale (libpng scale_16 — byte-exact vs Java ImageIO on
    real files); palette images resolve through PLTE to (h, w, 3) — or
    (h, w, 4) when a tRNS chunk carries per-entry alpha (short tables
    pad to opaque per the spec)."""
    import zlib

    if payload[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(PNG_SIG)
    ihdr = None
    plte = None
    trns = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        if pos + 12 + ln > len(payload):
            # a declared length past the buffer must hit the codec's
            # corrupt-payload contract (ValueError), not struct.error
            raise ValueError("truncated PNG chunk")
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("bad IHDR compression/filter method")
    if depth not in (1, 2, 4, 8, 16):
        raise NotImplementedError(f"{depth}-bit PNG")
    if color_type not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {color_type}")
    if depth < 8 and color_type not in (0, 3):
        raise ValueError(f"{depth}-bit depth invalid for color type "
                         f"{color_type} (spec: gray/palette only)")
    if depth == 16 and color_type == 3:
        raise ValueError("16-bit depth invalid for palette images")
    if interlace not in (0, 1):
        raise ValueError(f"bad interlace method {interlace}")
    ch = _PNG_CHANNELS[color_type]
    bpp = max(1, ch * depth // 8)  # filter pixel offset, bytes
    data = zlib.decompress(bytes(idat))
    flat = np.frombuffer(data, dtype=np.uint8)

    if interlace == 0:
        regions = [(0, 0, 1, 1, w, h)]
    else:  # Adam7: (x0, y0, dx, dy) per pass, empty passes skipped
        regions = [(x0, y0, dx, dy,
                    (w - x0 + dx - 1) // dx, (h - y0 + dy - 1) // dy)
                   for x0, y0, dx, dy in
                   ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
                   if (w - x0 + dx - 1) // dx > 0 and (h - y0 + dy - 1) // dy > 0]
    if len(flat) != sum(hr * (1 + -(-wr * ch * depth // 8))
                        for *_, wr, hr in regions):
        raise ValueError("IDAT size mismatch")

    img = np.zeros((h, w * ch) if interlace == 0 else (h, w, ch),
                   dtype=np.uint8)
    pos2 = 0
    for x0, y0, dx, dy, wr, hr in regions:
        stride = -(-wr * ch * depth // 8)
        rows = _png_unfilter(flat, pos2, hr, stride, bpp)
        pos2 += hr * (1 + stride)
        samp = _png_samples(rows, wr, ch, depth)  # (hr, wr*ch)
        if interlace == 0:
            img = samp
        else:
            img[y0::dy, x0::dx] = samp.reshape(hr, wr, ch)
    out = img.reshape(h, w * ch)

    if color_type == 0 and depth < 8:
        out = out * np.uint8(255 // ((1 << depth) - 1))  # sample scaling
    if color_type == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        idx = out.reshape(h, w)
        if trns is not None:
            alpha = np.full(plte.shape[0], 255, dtype=np.uint8)
            alpha[: trns.size] = trns[: plte.shape[0]]
            return np.dstack([plte[idx], alpha[idx]])
        return plte[idx]
    if ch == 1:
        return out.reshape(h, w)
    return out.reshape(h, w, ch)


def _png_unfilter(flat: np.ndarray, pos: int, h: int, stride: int,
                  bpp: int) -> np.ndarray:
    """Undo the five PNG row filters over h scanlines of ``stride``
    bytes starting at flat[pos]; ``bpp`` is the filter's left-pixel
    byte offset. None/Up vectorize per row; Sub/Average/Paeth carry a
    left-pixel dependency -> per-byte loop (decode is plumbing, not the
    hot path; see operators/multimodal.py)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = int(flat[pos])
        row = flat[pos + 1 : pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        if ft == 0:
            cur = row
        elif ft == 2:
            cur = (row + prev) & 0xFF
        elif ft == 1:
            cur = row
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ft == 3:
            cur = row
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            cur = row
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"PNG row filter {ft}")
        out[y] = cur
        prev = cur
    return out


def _png_samples(rows: np.ndarray, w: int, ch: int, depth: int) -> np.ndarray:
    """Unpack (h, stride) filtered bytes to (h, w*ch) uint8 samples:
    identity at depth 8, MSB-first bit groups below 8 (unscaled — gray
    sample scaling and palette lookup happen in the caller), and the
    rounded 255/65535 reduction at depth 16 (libpng's scale_16; never
    ties exactly at .5 since 65535 is odd)."""
    if depth == 8:
        return rows[:, : w * ch]
    if depth == 16:
        v16 = ((rows[:, : w * ch * 2 : 2].astype(np.uint32) << 8)
               | rows[:, 1 : w * ch * 2 : 2])
        return ((v16 * 255 + 32767) // 65535).astype(np.uint8)
    bits = np.unpackbits(rows, axis=1)
    weights = 1 << np.arange(depth - 1, -1, -1)
    groups = bits[:, : w * depth].reshape(rows.shape[0], w, depth)
    return (groups @ weights).astype(np.uint8)
