"""Real, dependency-free media codecs for the multimodal pipeline: WAV-PCM
and BMP are plain struct-and-numpy formats, so the decode step of
operators/multimodal.py is REAL for them (no PIL/libsndfile in this
environment; other formats keep the declared stub).

Formats supported:
* WAV: RIFF/WAVE, ``fmt `` chunk with PCM (format 1), 8- or 16-bit,
  any channel count; chunk walker skips unknown chunks (LIST, fact, ...).
* BMP: BITMAPFILEHEADER + BITMAPINFOHEADER (40-byte DIB), 24-bit
  uncompressed, bottom-up or top-down rows, 4-byte row padding.

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
