"""Multimodal plumbing tests: binary payload columns + typed metadata flow
through Arrow kernels; decode stub is deterministic and the NotImplemented
gate is real."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from matrixprofiler_spark.operators.multimodal import (
    audio_features,
    decode_audio,
    decode_image,
    image_features,
    synth_media_df,
)


def test_decode_stub_gate():
    with pytest.raises(NotImplementedError):
        decode_image(b"x", 4, 4, 3)
    with pytest.raises(NotImplementedError):
        decode_audio(b"x", 16)


def test_fake_decode_deterministic():
    a = decode_image(b"payload", 8, 6, 3, fake=True)
    b = decode_image(b"payload", 8, 6, 3, fake=True)
    assert a.shape == (6, 8, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    c = decode_image(b"other", 8, 6, 3, fake=True)
    assert not np.array_equal(a, c)


def test_image_features_spark(spark):
    media = synth_media_df(spark, 12)
    feats = image_features(media).collect()
    assert len(feats) == 6  # even ids are images
    for r in feats:
        assert 0 <= r.mean_lum <= 255
        assert len(r.resized_8x8) == 64
        assert isinstance(r.phash64, int)
    # determinism across partitioning
    again = image_features(synth_media_df(spark, 12).repartition(5)).collect()
    assert {r.media_id: r.phash64 for r in again} == {r.media_id: r.phash64 for r in feats}


def test_audio_features_spark(spark):
    media = synth_media_df(spark, 12)
    feats = audio_features(media, frame=512).collect()
    assert len(feats) == 6
    for r in feats:
        assert r.duration_sec > 0
        assert 0 < r.rms < 1.2
        assert 0 <= r.zero_crossing_rate <= 1
        assert len(r.frame_rms) == int(r.duration_sec * 16000) // 512


def test_media_schema(spark):
    media = synth_media_df(spark, 4)
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio"}
    assert media.schema["payload"].dataType.typeName() == "binary"


# ------------------------------------------------------- real codecs (WAV/BMP)

def _fixture(name):
    from pathlib import Path

    return (Path(__file__).parent / "fixtures" / name).read_bytes()


def test_wav_fixture_decodes_byte_exactly():
    """A real checked-in PCM16 WAV decodes to exactly int16/32768 of the
    generating signal — the real (non-stub) audio decode path."""
    import numpy as np

    from matrixprofiler_spark.codecs.media import parse_wav

    payload = _fixture("tone_440_1337.wav")
    x, sr = parse_wav(payload)
    assert sr == 16000 and x.shape == (1600, 1)
    t = np.arange(1600)
    sig = (np.sin(2 * np.pi * 440 * t / 16000) * 0.5
           + np.sin(2 * np.pi * 1337 * t / 16000) * 0.25)
    s16 = np.round(sig * 32767).astype(np.int16)
    assert (x[:, 0] == s16.astype(np.float32) / np.float32(32768.0)).all()


def test_bmp_fixture_decodes_byte_exactly():
    import numpy as np

    from matrixprofiler_spark.codecs.media import parse_bmp

    img = parse_bmp(_fixture("gradient_32x20.bmp"))
    assert img.shape == (20, 32, 3)
    h, w = 20, 32
    want = np.zeros((h, w, 3), dtype=np.uint8)
    want[..., 0] = np.arange(w)[None, :] * 8 % 256
    want[..., 1] = np.arange(h)[:, None] * 12 % 256
    want[..., 2] = (np.arange(w)[None, :] + np.arange(h)[:, None]) * 5 % 256
    assert (img == want).all()


def test_media_codec_roundtrips():
    import numpy as np

    from matrixprofiler_spark.codecs.media import (
        parse_bmp, parse_wav, write_bmp, write_wav,
    )

    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32767, size=(333, 2)).astype(np.int16)
    x, sr = parse_wav(write_wav(s, 8000))
    assert sr == 8000
    assert (x == s.astype(np.float32) / np.float32(32768.0)).all()
    img = rng.integers(0, 256, size=(13, 17, 3)).astype(np.uint8)  # odd stride pad
    assert (parse_bmp(write_bmp(img)) == img).all()


def test_features_on_real_media_payloads(spark):
    """End-to-end: a media table whose payloads are REAL WAV/BMP bytes runs
    the feature kernels through the actual decoders (fake_decode left at
    its default is irrelevant — magic bytes route to the real path)."""
    import numpy as np

    from matrixprofiler_spark.operators.multimodal import (
        audio_features, image_features,
    )

    wav = _fixture("tone_440_1337.wav")
    bmp = _fixture("gradient_32x20.bmp")
    rows = [
        ("real_aud", "audio", bytearray(wav), (None, None, None, 16000, 1600)),
        ("real_img", "image", bytearray(bmp), (32, 20, 3, None, None)),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id string, kind string, payload binary, "
        "meta struct<width:int,height:int,channels:int,sample_rate:int,n_samples:int>",
    )
    af = audio_features(media, fake_decode=False).collect()
    assert len(af) == 1 and af[0].media_id == "real_aud"
    t = np.arange(1600)
    sig = (np.sin(2 * np.pi * 440 * t / 16000) * 0.5
           + np.sin(2 * np.pi * 1337 * t / 16000) * 0.25)
    s16 = np.round(sig * 32767).astype(np.int16)
    x = s16.astype(np.float32) / np.float32(32768.0)
    want_rms = float(np.sqrt((x.astype(np.float64) ** 2).mean()))
    assert af[0].rms == want_rms
    assert af[0].duration_sec == 1600 / 16000
    im = image_features(media, fake_decode=False).collect()
    assert len(im) == 1 and im[0].media_id == "real_img"
    assert 0 < im[0].mean_lum < 255 and im[0].std_lum > 0


def test_png_roundtrips_all_types_and_filters():
    import numpy as np

    from matrixprofiler_spark.codecs.media import parse_png, write_png

    rng = np.random.default_rng(11)
    for shape in [(5, 7), (5, 7, 2), (5, 7, 3), (5, 7, 4), (1, 1), (3, 1, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for ft in (0, 1, 2, 3, 4, "mixed"):
            got = parse_png(write_png(img, filter_type=ft))
            assert got.shape == img.shape and (got == img).all(), (shape, ft)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(4, 6), dtype=np.uint8)
    got = parse_png(write_png(idx, filter_type="mixed", palette=pal))
    assert (got == pal[idx]).all()


def test_png_handcrafted_bytes_decode_exactly():
    """Fixture built from raw chunk bytes (independent of write_png):
    a 2x5 grayscale image exercising one row per filter type, with the
    reconstruction computed by hand from the spec's recurrences."""
    import struct
    import zlib

    import numpy as np

    from matrixprofiler_spark.codecs.media import PNG_SIG, parse_png

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    scan = bytes(
        [0, 10, 20,   # ft None  -> [10, 20]
         1, 5, 7,     # ft Sub   -> [5, 5+7=12]
         2, 1, 2,     # ft Up    -> [5+1=6, 12+2=14]
         3, 4, 6,     # ft Avg   -> [4+(0+6)//2=7, 6+(7+14)//2=16]
         4, 2, 3]     # ft Paeth -> [2+7=9, 3+16=19]
    )
    ihdr = struct.pack(">IIBBBBB", 2, 5, 8, 0, 0, 0, 0)
    png = (PNG_SIG + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))
    got = parse_png(png)
    want = np.array([[10, 20], [5, 12], [6, 14], [7, 16], [9, 19]],
                    dtype=np.uint8)
    assert (got == want).all()

    # CRC corruption must be detected, not decoded
    bad = bytearray(png)
    bad[len(PNG_SIG) + 8 + 3] ^= 0xFF  # flip a bit inside IHDR body
    with pytest.raises(ValueError, match="CRC"):
        parse_png(bytes(bad))

    # hand-built 16-bit gray, one row of big-endian samples; reduction is
    # the rounded 255/65535 scale: 0->0, 0x8000->round(127.998)=128,
    # 0xFFFF->255, 0x0101->1 (0x0101*255/65535 == 1.00392 exactly)
    row16 = bytes([0, 0x00, 0x00, 0x80, 0x00, 0xFF, 0xFF, 0x01, 0x01])
    ihdr16 = struct.pack(">IIBBBBB", 4, 1, 16, 0, 0, 0, 0)
    png16 = (PNG_SIG + chunk(b"IHDR", ihdr16)
             + chunk(b"IDAT", zlib.compress(row16)) + chunk(b"IEND", b""))
    assert (parse_png(png16) == np.array([[0, 128, 255, 1]])).all()

    # hand-built Adam7: 4x4 gray with pixel value 16*y + x, pass data
    # laid out by hand per the spec's pass grid (passes 2/3 are empty)
    adam = bytes(
        [0, 0,              # pass 1: (0,0)
         0, 2,              # pass 4: (0,2)
         0, 32, 34,         # pass 5: (2,0) (2,2)
         0, 1, 3,           # pass 6 row 0: (0,1) (0,3)
         0, 33, 35,         # pass 6 row 1: (2,1) (2,3)
         0, 16, 17, 18, 19,  # pass 7: row 1
         0, 48, 49, 50, 51]  # pass 7: row 3
    )
    ihdr7 = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)
    png7 = (PNG_SIG + chunk(b"IHDR", ihdr7)
            + chunk(b"IDAT", zlib.compress(adam)) + chunk(b"IEND", b""))
    got7 = parse_png(png7)
    want7 = (16 * np.arange(4)[:, None] + np.arange(4)).astype(np.uint8)
    assert (got7 == want7).all()

    # hand-built 2-bit gray, one row [0,1,2,3] packed MSB-first into one
    # byte (0b00011011) -> sample-scaled by 85
    ihdr2b = struct.pack(">IIBBBBB", 4, 1, 2, 0, 0, 0, 0)
    png2b = (PNG_SIG + chunk(b"IHDR", ihdr2b)
             + chunk(b"IDAT", zlib.compress(bytes([0, 0b00011011])))
             + chunk(b"IEND", b""))
    assert (parse_png(png2b) == np.array([[0, 85, 170, 255]])).all()


def test_decode_image_routes_png_by_magic():
    import numpy as np

    from matrixprofiler_spark.codecs.media import write_png
    from matrixprofiler_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    payload = write_png(img, filter_type="mixed")
    got = decode_image(payload, 11, 9, 3)  # no fake flag: real path
    assert (got == img).all()

    # decode_image's contract is (h, w, 3) RGB for every path the
    # feature kernels consume: gray replicates, GA/RGBA drop alpha
    gray = rng.integers(0, 256, size=(5, 4), dtype=np.uint8)
    g3 = decode_image(write_png(gray), 4, 5, 3)
    assert g3.shape == (5, 4, 3) and (g3 == gray[:, :, None]).all()
    rgba = rng.integers(0, 256, size=(5, 4, 4), dtype=np.uint8)
    r3 = decode_image(write_png(rgba), 4, 5, 3)
    assert r3.shape == (5, 4, 3) and (r3 == rgba[:, :, :3]).all()
    ga = rng.integers(0, 256, size=(5, 4, 2), dtype=np.uint8)
    a3 = decode_image(write_png(ga), 4, 5, 3)
    assert a3.shape == (5, 4, 3) and (a3 == ga[:, :, :1]).all()


def test_flac_roundtrips():
    import numpy as np

    from matrixprofiler_spark.codecs.flac import parse_flac, write_flac

    rng = np.random.default_rng(5)
    cases = [
        (np.sin(2 * np.pi * 440 * np.arange(10000) / 16000) * 12000,
         16000, 4096),
        (rng.integers(-32768, 32767, 5000), 44100, 4096),
        (np.full(3000, 123), 8000, 1024),
        (np.array([1, -2, 3]), 8000, 4096),
    ]
    for sig, sr, bs in cases:
        s = np.asarray(sig).astype(np.int16)
        x, got_sr = parse_flac(write_flac(s, sr, block_size=bs))
        assert got_sr == sr and x.shape == (s.size, 1)
        assert (np.round(x[:, 0] * 32768).astype(np.int64) == s).all()


def test_flac_lpc_roundtrips_exact():
    """LPC encode → decode is lossless: the quantized-integer predictor
    plus exact residuals reconstructs bit-identical samples, and on a
    strongly-autocorrelated signal the encoder actually CHOOSES LPC
    (stream differs from the FIXED-only encoding and is smaller)."""
    import numpy as np

    from matrixprofiler_spark.codecs.flac import parse_flac, write_flac

    rng = np.random.default_rng(7)
    t = np.arange(12000)
    # resonant signal: two sinusoids + slight noise — LPC territory
    sig = (9000 * np.sin(2 * np.pi * 441 * t / 16000)
           + 4000 * np.sin(2 * np.pi * 1330 * t / 16000 + 0.3)
           + rng.normal(0, 40, t.size)).astype(np.int16)
    for order in (1, 2, 4, 8, 12):
        enc = write_flac(sig, 16000, block_size=4096, max_lpc_order=order)
        x, sr = parse_flac(enc)
        assert sr == 16000
        assert (np.round(x[:, 0] * 32768).astype(np.int64) == sig).all(), order
    fixed_only = write_flac(sig, 16000, block_size=4096)
    lpc8 = write_flac(sig, 16000, block_size=4096, max_lpc_order=8)
    assert lpc8 != fixed_only and len(lpc8) < len(fixed_only)

    # stereo decorrelation modes compose with LPC
    left = sig[:6000]
    right = (left * 0.9).astype(np.int16)
    st = np.stack([left, right], axis=1)
    for mode in ("independent", "left_side", "mid_side"):
        x, _ = parse_flac(write_flac(st, 16000, block_size=1024,
                                     stereo_mode=mode, max_lpc_order=6))
        assert (np.round(x * 32768).astype(np.int64) == st).all(), mode

    # pathological inputs never break the LPC path (falls back to FIXED
    # or encodes degenerate LPC losslessly either way)
    for sig2 in (rng.integers(-32768, 32767, 3000).astype(np.int16),
                 np.zeros(100, dtype=np.int16),
                 np.array([5, -5], dtype=np.int16)):
        x, _ = parse_flac(write_flac(sig2, 8000, max_lpc_order=8))
        assert (np.round(x[:, 0] * 32768).astype(np.int64) == sig2).all()


def test_flac_stereo_decorrelation_modes_exact():
    import numpy as np

    from matrixprofiler_spark.codecs.flac import parse_flac, write_flac

    rng = np.random.default_rng(6)
    t = np.arange(6000)
    left = (np.sin(2 * np.pi * 330 * t / 8000) * 11000).astype(np.int16)
    right = (left * 0.9 + rng.integers(-300, 300, 6000)).astype(np.int16)
    st = np.stack([left, right], axis=1)
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        x, sr = parse_flac(
            write_flac(st, 8000, block_size=1024, stereo_mode=mode)
        )
        assert sr == 8000 and x.shape == (6000, 2), mode
        assert (np.round(x * 32768).astype(np.int64) == st).all(), mode


def test_flac_handcrafted_decoder_only_paths():
    """Bitstreams the default encoder never emits, built by hand with the
    bit writer: VERBATIM subframe, escape (raw) Rice partition, partition
    order > 0, wasted bits, a known-answer LPC subframe — plus CRC
    corruption and the reserved-LPC-precision refusal."""
    import struct

    import numpy as np

    from matrixprofiler_spark.codecs import flac as fl

    def stream_for(frame_body: bytes, n: int, ch: int = 1) -> bytes:
        info = struct.pack(">HH", 16, 16) + b"\x00" * 6
        group = (8000 << 44) | ((ch - 1) << 41) | (15 << 36) | n
        info += struct.pack(">Q", group) + b"\x00" * 16
        return (fl.FLAC_MAGIC + bytes([0x80])
                + struct.pack(">I", len(info))[1:] + info + frame_body)

    def frame(head_tail_writer) -> bytes:
        head = bytearray([0xFF, 0xF8, (0b0111 << 4), (0 << 4) | (0b100 << 1)])
        head += fl._utf8_number(0) + struct.pack(">H", 16 - 1)
        head += bytes([fl._crc8(bytes(head))])
        w = fl._BitWriter()
        w.bytes = bytearray(head)
        head_tail_writer(w)
        w.align()
        return bytes(w.bytes) + struct.pack(">H", fl._crc16(bytes(w.bytes)))

    vals = np.array([5, -3, 7, 0, 2, -8, 1, 4, -1, 6, -2, 3, 0, -5, 8, -7],
                    dtype=np.int64)

    # VERBATIM subframe
    def verbatim(w):
        w.write(0b0000001, 7)  # pad + type 000001 (VERBATIM)
        w.write(0, 1)          # no wasted bits
        for v in vals:
            w.write(int(v), 16)

    x, _ = fl.parse_flac(stream_for(frame(verbatim), 16))
    assert (np.round(x[:, 0] * 32768).astype(np.int64) == vals).all()

    # FIXED order 0, partition order 2 (4 partitions), one escape partition
    def partitions(w):
        w.write(0b0001000, 7)  # FIXED order 0
        w.write(0, 1)
        w.write(0, 2)          # method 0
        w.write(2, 4)          # partition order 2 -> 4 partitions of 4
        zz = fl._zigzag(vals)
        for p in range(4):
            part = zz[p * 4 : (p + 1) * 4]
            if p == 1:         # escape: raw 6-bit signed residuals
                w.write(0xF, 4)
                w.write(6, 5)
                for v in vals[4:8]:
                    w.write(int(v), 6)
            else:
                w.write(2, 4)  # rice param 2
                for v in part:
                    w.write_unary(int(v) >> 2)
                    w.write(int(v) & 3, 2)

    x, _ = fl.parse_flac(stream_for(frame(partitions), 16))
    assert (np.round(x[:, 0] * 32768).astype(np.int64) == vals).all()

    # wasted bits: samples all share a factor of 4 -> 2 wasted bits
    shifted = vals * 4

    def wasted(w):
        w.write(0b0000001, 7)  # VERBATIM
        w.write(1, 1)          # wasted-bits flag
        w.write_unary(1)       # unary 1 -> wasted = 2
        for v in vals:
            w.write(int(v), 14)  # 16 - 2 wasted

    x, _ = fl.parse_flac(stream_for(frame(wasted), 16))
    assert (np.round(x[:, 0] * 32768).astype(np.int64) == shifted).all()

    # hand-built LPC order-1 subframe: coef=+2^shift predicts x[i]=x[i-1],
    # residuals alternate +1/-1 — expected signal is a deterministic walk
    def lpc(w):
        w.write(0b0100000, 7)  # pad + LPC order 1
        w.write(0, 1)          # no wasted bits
        w.write(100, 16)       # warm-up sample
        w.write(14 - 1, 4)     # precision 14
        w.write(9, 5)          # shift 9
        w.write(1 << 9, 14)    # qcoef = 1.0 in Q9
        w.write(0, 2)          # Rice method 0
        w.write(0, 4)          # partition order 0
        w.write(0, 4)          # rice param 0
        for i in range(15):
            v = 1 if i % 2 == 0 else -1
            zz = (v << 1) ^ (v >> 63)
            w.write_unary(zz)

    x, _ = fl.parse_flac(stream_for(frame(lpc), 16))
    walk = [100]
    for i in range(15):
        walk.append(walk[-1] + (1 if i % 2 == 0 else -1))
    assert (np.round(x[:, 0] * 32768).astype(np.int64) == walk).all()

    # invalid LPC precision code 15 refuses loudly
    def lpc_bad_prec(w):
        w.write(0b0100000, 7)
        w.write(0, 1)
        w.write(100, 16)
        w.write(15, 4)  # reserved precision code

    with pytest.raises(ValueError, match="precision"):
        fl.parse_flac(stream_for(frame(lpc_bad_prec), 16))

    # CRC-16 corruption is detected
    good = frame(verbatim)
    bad = good[:-1] + bytes([good[-1] ^ 0xFF])
    with pytest.raises(ValueError, match="CRC-16"):
        fl.parse_flac(stream_for(bad, 16))


def test_decode_audio_routes_flac_by_magic():
    import numpy as np

    from matrixprofiler_spark.codecs.flac import write_flac
    from matrixprofiler_spark.operators.multimodal import decode_audio

    s = (np.sin(2 * np.pi * 100 * np.arange(4000) / 8000) * 9000).astype(np.int16)
    x = decode_audio(bytes(write_flac(s, 8000)), 4000)  # no fake flag
    assert (np.round(x * 32768).astype(np.int64) == s).all()


def test_jpeg_roundtrips_within_quantization_error():
    """JPEG is lossy by design: round-trips assert a tight error bound at
    high quality instead of bit equality — gray, RGB 4:4:4, RGB 4:2:0
    (chroma-smooth input), restart intervals, odd dimensions."""
    import numpy as np

    from matrixprofiler_spark.codecs.jpeg import parse_jpeg, write_jpeg

    x, yy = np.meshgrid(np.arange(64), np.arange(48))
    gray = (128 + 80 * np.sin(x / 9) * np.cos(yy / 7)).astype(np.uint8)
    rgb = np.stack([
        (128 + 60 * np.sin(x / 16)).astype(np.uint8),
        (128 + 60 * np.cos(yy / 14)).astype(np.uint8),
        (128 + 50 * np.sin((x + yy) / 20)).astype(np.uint8),
    ], axis=2)
    cases = [
        (gray, {}, 3),
        (gray[:13, :19], {}, 3),                       # non-multiple-of-8
        (gray, {"restart_interval": 3}, 3),
        (rgb, {}, 8),
        (rgb, {"subsample": True}, 10),                # 4:2:0
        (rgb[:45, :61], {"subsample": True}, 10),      # 4:2:0 + odd dims
        (rgb, {"subsample": True, "restart_interval": 1}, 10),
    ]
    for img, kw, bound in cases:
        got = parse_jpeg(write_jpeg(img, quality=95, **kw))
        assert got.shape == img.shape, kw
        err = np.abs(got.astype(int) - img.astype(int)).max()
        assert err <= bound, (kw, err)


def test_jpeg_handcrafted_dc_only_block():
    """Byte-by-byte fixture independent of write_jpeg: one 8x8 grayscale
    block, flat quant table (16), minimal custom Huffman tables, DC-only
    scan. DC category 2, magnitude bits 11 -> DC = 3; dequantized 48;
    the DC-only IDCT is uniform 48/8 = 6, +128 level shift = 134."""
    import struct

    import numpy as np

    from matrixprofiler_spark.codecs.jpeg import parse_jpeg

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0]) + bytes([16] * 64))
    sof = seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    # DC table: single length-1 code '0' -> symbol 2 (category 2)
    dht_dc = seg(0xC4, bytes([0x00, 1] + [0] * 15 + [2]))
    # AC table: single length-1 code '0' -> symbol 0x00 (EOB)
    dht_ac = seg(0xC4, bytes([0x10, 1] + [0] * 15 + [0x00]))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # scan bits: DC code '0', magnitude '11' (=3), AC EOB '0' -> 0110 + 1111 pad
    scan = bytes([0b01101111])
    jpg = b"\xFF\xD8" + dqt + sof + dht_dc + dht_ac + sos + scan + b"\xFF\xD9"
    got = parse_jpeg(jpg)
    assert got.shape == (8, 8)
    assert (got == 134).all()

    # same stream with a 16-bit (Pq=1) quant table decodes identically
    dqt16 = seg(0xDB, bytes([0x10]) + struct.pack(">64H", *([16] * 64)))
    jpg16 = b"\xFF\xD8" + dqt16 + sof + dht_dc + dht_ac + sos + scan + b"\xFF\xD9"
    assert (parse_jpeg(jpg16) == 134).all()


def test_jpeg_progressive_roundtrips():
    """Progressive (SOF2) streams decode to the SAME quantized
    coefficients the encoder produced — the multi-scan entropy coding
    (DC first/refine, split AC first scans with EOB codes, two AC
    refinement passes with correction bits) is exact, so pixels match
    the equivalent baseline decode to within the one-count float-DCT
    rounding delta."""
    import numpy as np

    from matrixprofiler_spark.codecs import jpeg as J

    rng = np.random.default_rng(13)
    # gray: smooth (long EOB runs) and noise (dense ZRL / correction bits)
    smooth = (np.add.outer(np.arange(40) * 3, np.arange(56) * 2) % 256
              ).astype(np.uint8)
    noise = rng.integers(0, 256, size=(23, 17), dtype=np.uint8)
    # pixel parity vs baseline: the two encoders batch the float DCT
    # differently, so a coefficient sitting exactly on a .5 quantization
    # boundary can flip between streams — a few counts of slack, not a
    # correctness bound (the exact bound is the coefficient test below)
    for img in (smooth, noise):
        for q in (95, 75, 50):
            d = np.abs(
                J.parse_jpeg(J.write_jpeg(img, q, progressive=True)).astype(int)
                - J.parse_jpeg(J.write_jpeg(img, q)).astype(int)).max()
            assert d <= 4, (img.shape, q, d)
    # color 4:4:4 / 4:2:0, and restart markers inside progressive scans
    img = rng.integers(0, 256, size=(25, 31, 3), dtype=np.uint8)
    for sub in (False, True):
        d = np.abs(
            J.parse_jpeg(J.write_jpeg(img, 85, subsample=sub,
                                      progressive=True)).astype(int)
            - J.parse_jpeg(J.write_jpeg(img, 85, subsample=sub)).astype(int)
        ).max()
        assert d <= 4, sub
    for ri in (2, 5):
        d = np.abs(
            J.parse_jpeg(J.write_jpeg(img, 85, progressive=True,
                                      restart_interval=ri)).astype(int)
            - J.parse_jpeg(J.write_jpeg(img, 85)).astype(int)).max()
        assert d <= 4, ri

    # coefficient-level EXACTNESS: what the decoder accumulates across
    # all six scans is bit-identical to the encoder's quantized DCT —
    # for the smooth image (EOB-dominated) and the noise image
    # (ZRL/correction-bit-dominated)
    for g, q in ((smooth, 75), (noise, 50)):
        prog = J.write_jpeg(g, quality=q, progressive=True)
        cap = {}
        orig = J._ProgState.render

        def render(self, qt):
            cap["coef"] = [c.copy() for c in self.coef]
            return orig(self, qt)

        J._ProgState.render = render
        try:
            J.parse_jpeg(prog)
        finally:
            J._ProgState.render = orig
        ql = J._scaled_q(J._QL, q)[J.ZIGZAG]
        h, w = g.shape
        mcux, mcuy = -(-w // 8), -(-h // 8)
        pp = np.empty((mcuy * 8, mcux * 8))
        pp[:h, :w] = g.astype(np.float64) - 128.0
        if mcuy * 8 > h:
            pp[h:, :w] = pp[h - 1 : h, :w]
        if mcux * 8 > w:
            pp[:, w:] = pp[:, w - 1 : w]
        blocks = pp.reshape(mcuy, 8, mcux, 8).transpose(0, 2, 1, 3)
        x = np.einsum("ij,abjk,kl->abil", J._C, blocks, J._C.T)
        want = np.round(x.reshape(mcuy, mcux, 64)[..., J.ZIGZAG] / ql
                        ).astype(np.int64)
        assert np.array_equal(cap["coef"][0], want), q


def test_jpeg_arithmetic_refuses():
    import numpy as np
    import pytest as _pytest

    from matrixprofiler_spark.codecs.jpeg import parse_jpeg, write_jpeg

    x, yy = np.meshgrid(np.arange(16), np.arange(16))
    img = ((x * yy) % 256).astype(np.uint8)
    good = bytearray(write_jpeg(img))
    i = good.find(b"\xFF\xC0")
    good[i + 1] = 0xC9  # SOF9: arithmetic-coded extended sequential
    with _pytest.raises(NotImplementedError, match="FFC9"):
        parse_jpeg(bytes(good))


def test_decode_image_routes_jpeg_by_magic():
    import numpy as np

    from matrixprofiler_spark.codecs.jpeg import write_jpeg
    from matrixprofiler_spark.operators.multimodal import decode_image

    x, yy = np.meshgrid(np.arange(24), np.arange(16))
    gray = ((x * 7 + yy * 5) % 256).astype(np.uint8)
    out = decode_image(write_jpeg(gray, quality=95), 24, 16, 3)  # real path
    assert out.shape == (16, 24, 3)
    assert np.abs(out[..., 0].astype(int) - gray.astype(int)).max() <= 4
    assert (out[..., 0] == out[..., 1]).all()  # gray replicated to RGB
    # progressive streams route through the same magic detection
    outp = decode_image(write_jpeg(gray, quality=95, progressive=True),
                        24, 16, 3)
    assert outp.shape == (16, 24, 3)
    assert np.abs(outp[..., 0].astype(int) - gray.astype(int)).max() <= 4


def test_features_on_all_real_codec_payloads(spark):
    """End-to-end over every real codec: a media table whose payloads are
    PNG, JPEG, WAV and FLAC bytes runs the Spark feature kernels through
    the actual decoders (magic-byte routed — no fake flag involved)."""
    import numpy as np

    from matrixprofiler_spark.codecs.flac import write_flac
    from matrixprofiler_spark.codecs.jpeg import write_jpeg
    from matrixprofiler_spark.codecs.media import write_png, write_wav
    from matrixprofiler_spark.operators.multimodal import (
        audio_features, image_features,
    )

    x, yy = np.meshgrid(np.arange(32), np.arange(20))
    img = ((x * 5 + yy * 9) % 256).astype(np.uint8)
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    t = np.arange(1600)
    sig = np.round(np.sin(2 * np.pi * 440 * t / 16000) * 12000).astype(np.int16)
    rows = [
        ("png", "image", bytearray(write_png(rgb)), (32, 20, 3, None, None)),
        ("jpeg", "image", bytearray(write_jpeg(rgb, quality=95)),
         (32, 20, 3, None, None)),
        ("wav", "audio", bytearray(write_wav(sig, 16000)),
         (None, None, None, 16000, 1600)),
        ("flac", "audio", bytearray(write_flac(sig, 16000)),
         (None, None, None, 16000, 1600)),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id string, kind string, payload binary, "
        "meta struct<width:int,height:int,channels:int,sample_rate:int,n_samples:int>",
    )
    im = {r.media_id: r for r in image_features(media, fake_decode=False).collect()}
    assert set(im) == {"png", "jpeg"}
    # PNG is lossless: its luminance stats are exact vs numpy
    want_mean = float(img.astype(np.float64).mean())
    assert im["png"].mean_lum == want_mean
    # JPEG is lossy but tight at q95
    assert abs(im["jpeg"].mean_lum - want_mean) < 2.0
    af = {r.media_id: r for r in audio_features(media, fake_decode=False).collect()}
    assert set(af) == {"wav", "flac"}
    # FLAC is lossless: identical samples -> identical features as WAV
    assert af["flac"].rms == af["wav"].rms
    assert af["flac"].zero_crossing_rate == af["wav"].zero_crossing_rate


def test_jpeg_progressive_handcrafted_eobrun():
    """Decoder-only progressive constructs the in-repo encoder never
    emits (it always ends blocks with EOB0): EOBn codes with r > 0 —
    multi-block EOB runs — in both an AC first scan and an AC
    refinement scan, built by hand with the bit writer against a
    custom Huffman table that contains the EOB1/EOB2 symbols."""
    import struct

    import numpy as np

    from matrixprofiler_spark.codecs import jpeg as J

    w, h = 32, 8  # one row of four 8x8 blocks, grayscale

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0]) + bytes([1] * 64))  # identity dequant
    sof = seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dht_dc = seg(0xC4, bytes([0x00] + J._DC_LUM[0]) + bytes(J._DC_LUM[1]))
    # custom AC table: len-2 codes 00,01,10 -> 0x01, 0x11, 0x10(EOB1);
    # len-3 codes 110,111 -> 0x20(EOB2), 0x00(EOB0)
    ac_bits = [0, 3, 2] + [0] * 13
    ac_vals = [0x01, 0x11, 0x10, 0x20, 0x00]
    dht_ac = seg(0xC4, bytes([0x10] + ac_bits) + bytes(ac_vals))
    ac_enc = J._build_encode_table(ac_bits, ac_vals)
    dc_enc = J._build_encode_table(*J._DC_LUM)

    # scan 1: DC first, Al=0, DCs 10/20/30/40 (diffs of 10, category 4)
    w1 = J._BitWriterJ()
    for _ in range(4):
        ln, code = dc_enc[4]
        w1.write(code, ln)
        w1.write(10, 4)
    w1.flush()
    sos_dc = seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))

    # scan 2: AC first, band 1..63, Al=1.
    # block0: (r0,s1) coef[1]=+1 -> stored 2; then EOB1 + ext bit 1
    #         => eobrun covers blocks 1 AND 2
    # block3: (r1,s1) coef[2]=-1 -> stored -2; then EOB0
    w2 = J._BitWriterJ()
    ln, code = ac_enc[0x01]
    w2.write(code, ln)
    w2.write(1, 1)  # +1
    ln, code = ac_enc[0x10]
    w2.write(code, ln)
    w2.write(1, 1)  # EOB1 extension bit: run = 2^1 + 1 ... covers 2 more blocks
    ln, code = ac_enc[0x11]
    w2.write(code, ln)
    w2.write(0, 1)  # -1
    ln, code = ac_enc[0x00]
    w2.write(code, ln)
    w2.flush()
    sos_ac1 = seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))

    # scan 3: AC refinement Ah=1 -> Al=0, one EOB2 run covering ALL four
    # blocks; correction bits: block0 k=1 gets bit 1 (2 -> 3), block3 k=2
    # gets bit 0 (-2 stays)
    w3 = J._BitWriterJ()
    ln, code = ac_enc[0x20]
    w3.write(code, ln)
    w3.write(0, 2)  # EOB2 extension: run = 4 blocks
    w3.write(1, 1)  # block0 correction bit
    w3.write(0, 1)  # block3 correction bit
    w3.flush()
    sos_ac2 = seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))

    stream = (b"\xFF\xD8" + dqt + sof + dht_dc + dht_ac
              + sos_dc + bytes(w1.out) + sos_ac1 + bytes(w2.out)
              + sos_ac2 + bytes(w3.out) + b"\xFF\xD9")
    got = J.parse_jpeg(stream)

    # expected: dequant(identity) + IDCT of the hand-placed coefficients
    dcs = [10, 20, 30, 40]
    want = np.empty((8, 32))
    for b in range(4):
        zz = np.zeros(64)
        zz[0] = dcs[b]
        if b == 0:
            zz[1] = 3  # 2 refined by bit 1
        if b == 3:
            zz[2] = -2  # correction bit 0: unchanged
        nat = np.zeros(64)
        nat[J.ZIGZAG] = zz
        want[:, b * 8 : b * 8 + 8] = J._C.T @ nat.reshape(8, 8) @ J._C + 128.0
    want = np.clip(np.round(want), 0, 255).astype(np.uint8)
    assert got.shape == (8, 32)
    assert (got == want).all()


def test_jpeg_asymmetric_chroma_sampling():
    """4:2:2 (H2V1) and 4:4:0 (H1V2) chroma layouts — the decoder's
    non-square sampling-factor replication paths — round-trip with
    bounded error in both baseline and progressive streams, and
    subsample=True stays byte-identical to "420"."""
    import numpy as np

    from matrixprofiler_spark.codecs.jpeg import parse_jpeg, write_jpeg

    yy, xx = np.mgrid[0:37, 0:45]
    img = np.stack([(yy * 3 + xx) % 256, (yy + xx * 2) % 256,
                    (yy * 2 + xx * 3) % 256], axis=2).astype(np.uint8)
    for mode in ("422", "440"):
        for prog in (False, True):
            dec = parse_jpeg(write_jpeg(img, quality=92, subsample=mode,
                                        progressive=prog)).astype(int)
            assert np.abs(dec - img.astype(int)).max() < 40, (mode, prog)
    assert (write_jpeg(img, 90, subsample=True)
            == write_jpeg(img, 90, subsample="420"))
    with pytest.raises(ValueError, match="subsample"):
        write_jpeg(img, 90, subsample="411")


def test_jpeg_progressive_corrupt_streams_refuse_loudly():
    """Robustness contract on progressive streams (self-review r6): a
    scan-less SOF2 file, an out-of-range spectral band, a truncated
    stream, and an undefined Huffman-table reference each raise a named
    ValueError instead of fabricating pixels or crashing with raw
    IndexError/TypeError."""
    import numpy as np

    from matrixprofiler_spark.codecs import jpeg as J

    rng = np.random.default_rng(31)
    g = rng.integers(0, 256, size=(23, 17), dtype=np.uint8)
    prog = J.write_jpeg(g, progressive=True)
    sos = [m for m in range(len(prog) - 1)
           if prog[m] == 0xFF and prog[m + 1] == 0xDA]

    noscan = prog[: sos[0]] + b"\xFF\xD9"
    with pytest.raises(ValueError, match="no scan found"):
        J.parse_jpeg(noscan)

    bad_se = bytearray(prog)
    assert bad_se[sos[1] + 8] in (5, 63)  # Se byte of the first AC scan
    bad_se[sos[1] + 8] = 200
    with pytest.raises(ValueError, match="spectral band"):
        J.parse_jpeg(bytes(bad_se))

    with pytest.raises(ValueError, match="truncated"):
        J.parse_jpeg(prog[:-1])  # stream ends on a lone 0xFF

    bad_tab = bytearray(prog)
    assert bad_tab[sos[1] + 6] == 0x00  # table-selector byte
    bad_tab[sos[1] + 6] = 0x33
    with pytest.raises(ValueError, match="undefined AC Huffman table 3"):
        J.parse_jpeg(bytes(bad_tab))


SYSTEM_JPEGS = [
    # (path, progressive?) — real third-party-encoded files shipped with
    # the Spark binary distro / OS packages in this environment
    ("/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
     "multi-channel/grayscale.jpg", True),
    ("/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
     "kittens/DP153539.jpg", False),
    ("/usr/share/doc/nodejs/full-white-stripe.jpg", True),
    ("/usr/share/doc/nodejs/thin-white-stripe.jpg", True),
]


@pytest.mark.skipif(
    not all(__import__("os").path.exists(p) for p, _ in SYSTEM_JPEGS),
    reason="system sample JPEGs not present",
)
def test_jpeg_decoder_matches_java_imageio_on_real_files(spark):
    """EXTERNAL validation: real-world JPEGs produced by third-party
    encoders (including progressive SOF2 files with genuine EOB runs and
    non-Annex-K tables) decode pixel-equivalent to Java ImageIO via
    Spark's image source — an entirely independent decoder. Grayscale
    progressive matches within +-1 (IDCT rounding); color files differ
    only at chroma-upsampling edges (we replicate, ImageIO smooths), so
    the bound there is mean|diff| and a tiny tail fraction."""
    import numpy as np

    from matrixprofiler_spark.codecs.jpeg import parse_jpeg

    for path, prog in SYSTEM_JPEGS:
        data = open(path, "rb").read()
        assert (b"\xFF\xC2" in data) == prog  # frame type sanity
        r = (spark.read.format("image").load(path)
             .select("image.*").collect()[0])
        ref = np.frombuffer(bytes(r.data), dtype=np.uint8).reshape(
            r.height, r.width, r.nChannels)
        mine = parse_jpeg(data)
        if mine.ndim == 2 and r.nChannels == 1:
            ref = ref[:, :, 0]
        else:
            ref = ref[:, :, ::-1]  # BGR -> RGB
        assert mine.shape == ref.shape, path
        d = np.abs(mine.astype(int) - ref.astype(int))
        if mine.ndim == 2:
            assert d.max() <= 2, path  # no chroma: near-exact
        else:
            assert float(d.mean()) < 1.0, (path, d.mean())
            assert float((d > 8).mean()) < 1e-3, (path, (d > 8).mean())


def test_png_palette_trns_alpha():
    """Palette PNG with a tRNS chunk resolves to (h, w, 4): per-entry
    alpha applied through the index map, short tables padded opaque per
    the spec. Built from raw chunks, expected values by hand."""
    import struct
    import zlib

    import numpy as np

    from matrixprofiler_spark.codecs.media import PNG_SIG, parse_png

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    plte = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255])  # 3 entries
    trns = bytes([10, 200])  # entry 2 pads to opaque 255
    # 2 rows of 4 indices, each row led by its filter byte (None)
    scan = bytes([0, 0, 1, 2, 0,  0, 2, 1, 0, 0])
    ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0)
    png = (PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
           + chunk(b"tRNS", trns) + chunk(b"IDAT", zlib.compress(scan))
           + chunk(b"IEND", b""))
    got = parse_png(png)
    assert got.shape == (2, 4, 4)
    idx = [0, 1, 2, 0, 2, 1, 0, 0]
    want_rgb = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255]][i]
                         for i in idx], dtype=np.uint8).reshape(2, 4, 3)
    want_a = np.array([[10, 200, 255][i] for i in idx],
                      dtype=np.uint8).reshape(2, 4)
    assert (got[..., :3] == want_rgb).all()
    assert (got[..., 3] == want_a).all()

    # without tRNS the same image still resolves to (h, w, 3)
    png3 = (PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
            + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))
    assert parse_png(png3).shape == (2, 4, 3)


SYSTEM_PNGS = [
    "/usr/share/doc/nodejs/osx_installer_logo.png",  # palette + tRNS
    "/usr/share/gitweb/static/git-logo.png",
    "/usr/share/doc/python3/_static/file.png",
    "/usr/share/doc/libpng-dev/examples/pngtest.png",  # Adam7 RGBA
    "/usr/share/gitweb/static/git-favicon.png",  # 2-bit palette
    "/usr/share/icons/hicolor/48x48/apps/gvim.png",  # 4-bit palette
    "/usr/share/info/gnupg-module-overview.png",  # 16-bit RGBA
]


@pytest.mark.skipif(
    not all(__import__("os").path.exists(p) for p in SYSTEM_PNGS),
    reason="system sample PNGs not present",
)
def test_png_decoder_matches_java_imageio_exactly(spark):
    """EXTERNAL validation: PNG is lossless, so real third-party files
    must decode BYTE-EXACTLY equal to Java ImageIO via Spark's image
    source — including the palette+tRNS alpha path."""
    import numpy as np

    from matrixprofiler_spark.codecs.media import parse_png

    for path in SYSTEM_PNGS:
        mine = parse_png(open(path, "rb").read())
        r = (spark.read.format("image").load(path)
             .select("image.*").collect()[0])
        ref = np.frombuffer(bytes(r.data), np.uint8).reshape(
            r.height, r.width, r.nChannels)
        if mine.ndim == 2:
            mine = mine[:, :, None]
        if r.nChannels == 4:
            if mine.shape[2] == 4:
                cmp_ = mine[:, :, [2, 1, 0, 3]]  # RGBA -> BGRA
            else:
                opaque = np.full(mine.shape[:2] + (1,), 255, np.uint8)
                cmp_ = np.concatenate([mine[:, :, ::-1], opaque], axis=2)
        elif r.nChannels == 3:
            cmp_ = mine[:, :, ::-1] if mine.shape[2] == 3 else np.repeat(
                mine, 3, axis=2)
        else:
            cmp_ = mine
        assert cmp_.shape == ref.shape, path
        assert np.array_equal(cmp_, ref), path
