"""Real media decoders (operators/media_codecs.py): exact pixel/sample
arrays from hand-built BMP/PPM/WAV binaries, plus the mapInPandas
decode="real" path end-to-end."""

import io
import struct
import wave

import numpy as np
import pytest

from incubator_paimon_spark.operators.media_codecs import (
    decode_bmp, decode_ppm, decode_wav, real_features, sniff)


def make_bmp(px_rgb: np.ndarray, top_down=False) -> bytes:
    """Encode (h, w, 3) RGB uint8 as 24bpp BMP (file order BGR, padded
    rows, bottom-up unless top_down)."""
    h, w, _ = px_rgb.shape
    stride = (w * 3 + 3) & ~3
    rows = px_rgb if top_down else px_rgb[::-1]
    body = b"".join(
        row[:, ::-1].tobytes() + b"\x00" * (stride - w * 3) for row in rows)
    hdr = (struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24,
                         0, len(body), 2835, 2835, 0, 0))
    return hdr + body


def test_bmp_roundtrip_bottom_up_and_padding():
    # w=3 -> stride 12 (3 pad bytes per row), exercising the padding path
    px = np.arange(3 * 2 * 3, dtype=np.uint8).reshape(2, 3, 3)
    got = decode_bmp(make_bmp(px))
    np.testing.assert_array_equal(got, px)


def test_bmp_top_down():
    px = np.random.default_rng(7).integers(0, 256, (4, 8, 3), np.uint8)
    np.testing.assert_array_equal(decode_bmp(make_bmp(px, top_down=True)), px)
    np.testing.assert_array_equal(decode_bmp(make_bmp(px)), px)


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_bmp(b"PNG....")
    bad = bytearray(make_bmp(np.zeros((1, 1, 3), np.uint8)))
    struct.pack_into("<H", bad, 28, 8)  # bpp=8
    with pytest.raises(ValueError, match="24/32bpp"):
        decode_bmp(bytes(bad))


def test_ppm_with_comments():
    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    buf = b"P6\n# a comment\n2 2\n# another\n255\n" + px.tobytes()
    np.testing.assert_array_equal(decode_ppm(buf), px)
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(buf[:-1])


def test_wav_16bit_against_stdlib_writer():
    rng = np.random.default_rng(3)
    samples = rng.integers(-32768, 32767, (100, 2), np.int16)
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(samples.tobytes())
    rate, got = decode_wav(bio.getvalue())
    assert rate == 16000
    np.testing.assert_array_equal(got, samples)


def test_wav_8bit_and_chunk_skipping():
    # hand-build: LIST chunk before fmt/data must be skipped; 8-bit
    # unsigned centers at 128
    raw = bytes([0, 128, 255, 64])
    chunks = (b"LIST" + struct.pack("<I", 4) + b"INFO"
              + b"fmt " + struct.pack("<I", 16)
              + struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
              + b"data" + struct.pack("<I", len(raw)) + raw)
    buf = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    rate, got = decode_wav(buf)
    assert rate == 8000
    np.testing.assert_array_equal(got.ravel(),
                                  np.array([-128, 0, 127, -64], np.int16))


def test_sniff_and_real_features():
    px = np.full((4, 8, 3), 10, np.uint8)
    px[..., 0] = 200  # R
    bmp = make_bmp(px)
    assert sniff(bmp) == "bmp"
    f = real_features(bmp, 8)
    assert f[:5] == [8.0, 4.0, 200.0, 10.0, 10.0]
    assert f[5:] == [0.0, 0.0, 0.0]

    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(np.array([3, -3, 3, -3], np.int16).tobytes())
    fa = real_features(bio.getvalue(), 6)
    assert fa == [44100.0, 4.0, 0.0, 3.0, 0.0, 0.0]

    with pytest.raises(ValueError, match="undecodable"):
        real_features(b"\x89PNG\r\n", 4)


def test_extract_features_real_mapinpandas(spark):
    from incubator_paimon_spark.operators.multimodal import extract_features
    px = np.zeros((4, 8, 3), np.uint8)
    px[..., 1] = 77
    rows = [(1, make_bmp(px)), (2, make_bmp(px, top_down=True))]
    df = spark.createDataFrame(rows, "media_id long, bytes binary")
    got = {r.media_id: r.features
           for r in extract_features(df, dim=5, decode="real").collect()}
    assert got[1] == got[2] == [8.0, 4.0, 0.0, 77.0, 0.0]


# ----------------------------------------------------------------------
# PNG (r12): non-interlaced 8-bit gray/RGB/RGBA, all five filter types

def make_png(px: np.ndarray, filters=None) -> bytes:
    """Encode (h, w, c) uint8 as an 8-bit PNG, forward-filtering each row
    with the given filter type (so decode must exactly invert)."""
    import zlib

    from incubator_paimon_spark.operators.media_codecs import _paeth
    h, w, c = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    filters = filters if filters is not None else [0] * h
    stride = w * c
    flat = px.reshape(h, stride).astype(np.int32)
    raw = b""
    for y, ft in enumerate(filters):
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        enc = bytearray()
        for x in range(stride):
            a = int(flat[y, x - c]) if x >= c else 0
            b = int(prev[x])
            cc = int(prev[x - c]) if (x >= c and y) else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1,
                    4: _paeth(a, b, cc)}[ft]
            enc.append((int(flat[y, x]) - pred) & 0xFF)
        raw += bytes([ft]) + bytes(enc)

    def chunk(cid, body):
        return (struct.pack(">I", len(body)) + cid + body
                + struct.pack(">I", zlib.crc32(cid + body)))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_roundtrip_all_filters():
    from incubator_paimon_spark.operators.media_codecs import decode_png
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (5, 7, 3), np.uint8)
    for filters in ([0] * 5, [1] * 5, [2] * 5, [3] * 5, [4] * 5,
                    [0, 1, 2, 3, 4], [4, 3, 2, 1, 0]):
        got = decode_png(make_png(px, filters))
        np.testing.assert_array_equal(got, px, err_msg=str(filters))


def test_png_gray_and_rgba():
    from incubator_paimon_spark.operators.media_codecs import decode_png
    rng = np.random.default_rng(13)
    for c in (1, 2, 4):
        px = rng.integers(0, 256, (3, 4, c), np.uint8)
        np.testing.assert_array_equal(
            decode_png(make_png(px, [0, 2, 4])), px)


def test_png_split_idat_and_rejects():
    import zlib

    from incubator_paimon_spark.operators.media_codecs import decode_png
    px = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    buf = make_png(px)
    # split the IDAT payload into two chunks: decoders must concatenate
    i = buf.index(b"IDAT") - 4
    (size,) = struct.unpack_from(">I", buf, i)
    body = buf[i + 8:i + 8 + size]
    def chunk(cid, b):
        return (struct.pack(">I", len(b)) + cid + b
                + struct.pack(">I", zlib.crc32(cid + b)))
    two = (buf[:i] + chunk(b"IDAT", body[:3]) + chunk(b"IDAT", body[3:])
           + buf[i + 12 + size:])
    np.testing.assert_array_equal(decode_png(two), px)

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM123456")
    bad = bytearray(make_png(px))
    bad[24] = 16  # bit depth 16
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(bytes(bad))
    bad = bytearray(make_png(px))
    bad[28] = 1  # Adam7 interlace
    with pytest.raises(ValueError, match="8-bit|interlace"):
        decode_png(bytes(bad))
    bad = bytearray(make_png(px))
    bad[25] = 3  # palette color type
    with pytest.raises(ValueError, match="color type"):
        decode_png(bytes(bad))


def test_png_real_features_and_sniff():
    from incubator_paimon_spark.operators.media_codecs import sniff as sn
    px = np.full((4, 8, 3), 10, np.uint8)
    px[..., 2] = 160  # B
    buf = make_png(px, [0, 1, 2, 4])
    assert sn(buf) == "png"
    assert real_features(buf, 6) == [8.0, 4.0, 10.0, 10.0, 160.0, 0.0]
    # grayscale replicates its mean; alpha is ignored
    g = np.full((2, 4, 1), 40, np.uint8)
    assert real_features(make_png(g), 5) == [4.0, 2.0, 40.0, 40.0, 40.0]
    ra = np.zeros((2, 2, 4), np.uint8)
    ra[..., 0] = 90
    ra[..., 3] = 255
    assert real_features(make_png(ra), 5) == [2.0, 2.0, 90.0, 0.0, 0.0]


def make_bmp32(px_rgba: np.ndarray, top_down=False) -> bytes:
    """Encode (h, w, 4) RGBA uint8 as 32bpp BMP (file order BGRA)."""
    h, w, _ = px_rgba.shape
    rows = px_rgba if top_down else px_rgba[::-1]
    body = b"".join(
        np.concatenate([row[:, 2::-1], row[:, 3:]], axis=1).tobytes()
        for row in rows)
    hdr = (struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 32,
                         0, len(body), 2835, 2835, 0, 0))
    return hdr + body


def test_bmp_32bpp_roundtrip():
    px = np.random.default_rng(3).integers(0, 256, (3, 5, 4), np.uint8)
    np.testing.assert_array_equal(decode_bmp(make_bmp32(px)), px)
    np.testing.assert_array_equal(decode_bmp(make_bmp32(px, top_down=True)),
                                  px)
    # features ignore alpha (same rule as RGBA PNG)
    solid = np.zeros((2, 4, 4), np.uint8)
    solid[..., 1] = 55
    solid[..., 3] = 200
    assert real_features(make_bmp32(solid), 5) == [4.0, 2.0, 0.0, 55.0, 0.0]


def test_wav_24_and_32_bit():
    from incubator_paimon_spark.operators.media_codecs import decode_wav

    def wav(bits, payload, channels=1, rate=8000):
        return (b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
                + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                        rate * channels * bits // 8,
                                        channels * bits // 8, bits)
                + b"data" + struct.pack("<I", len(payload)) + payload)

    vals = [0, 1, -1, 8_388_607, -8_388_608, 123_456, -123_456]
    payload = b"".join(
        (v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    rate, frames = wav(24, payload), None
    r, frames = decode_wav(rate)
    assert r == 8000
    assert frames[:, 0].tolist() == vals

    vals32 = [0, 2**31 - 1, -(2**31), 42, -42]
    payload = np.array(vals32, "<i4").tobytes()
    r, frames = decode_wav(wav(32, payload))
    assert frames[:, 0].tolist() == vals32

    # stereo 24-bit: interleave splits into 2 channels
    payload = b"".join((v & 0xFFFFFF).to_bytes(3, "little")
                       for v in [10, -10, 20, -20])
    r, frames = decode_wav(wav(24, payload, channels=2))
    assert frames.tolist() == [[10, -10], [20, -20]]


def test_png_roundtrip_property():
    """Randomized round-trip across sizes, channel counts and per-row
    filter choices (hypothesis): encode with forward filtering, decode,
    compare exact."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from incubator_paimon_spark.operators.media_codecs import decode_png

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 6), st.integers(1, 6),
           st.sampled_from([1, 2, 3, 4]), st.data())
    def check(w, h, c, data):
        rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
        px = rng.integers(0, 256, (h, w, c), np.uint8)
        filters = [data.draw(st.integers(0, 4)) for _ in range(h)]
        np.testing.assert_array_equal(decode_png(make_png(px, filters)), px)

    check()
