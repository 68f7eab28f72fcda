"""Vendored pure-stdlib PNG/WAV codecs: round trips, filter coverage,
sniffing, and rejection of out-of-scope inputs."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from nspc_etl_basic_spark.operators.codecs import (
    PNG_MAGIC,
    _chunk,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    resize_nearest,
    sniff_media,
)


@pytest.mark.parametrize(
    "shape", [(1, 1), (5, 7), (16, 16, 3), (3, 4, 4), (33, 9, 3)]
)
def test_png_roundtrip(shape):
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, shape, dtype=np.uint8)
    got = decode_png(encode_png(a))
    exp = a[:, :, None] if a.ndim == 2 else a
    assert got.shape == exp.shape
    assert (got == exp).all()


def _png_with_filter(a: np.ndarray, build_row) -> bytes:
    """Hand-assemble a PNG whose every scanline uses one filter type."""
    h, w, ch = a.shape
    stride = w * ch
    rows, prev = [], np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = a[y].reshape(-1)
        rows.append(build_row(line, prev, ch))
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6}[ch], 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )


def test_png_decode_sub_and_up_filters():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)

    def up_row(line, prev, ch):
        return b"\x02" + ((line - prev) & 0xFF).astype(np.uint8).tobytes()

    def sub_row(line, prev, ch):
        d = line.astype(np.int16).copy()
        d[ch:] -= line[:-ch]
        return b"\x01" + (d & 0xFF).astype(np.uint8).tobytes()

    assert (decode_png(_png_with_filter(a, up_row)) == a).all()
    assert (decode_png(_png_with_filter(a, sub_row)) == a).all()


def test_png_rejects_out_of_scope():
    with pytest.raises(ValueError):
        decode_png(b"definitely not a png")
    # 16-bit depth is out of scope
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    png = PNG_MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png(png)


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(2)
    mono = rng.integers(-32768, 32768, 500).astype(np.int16)
    rate, got = decode_wav(encode_wav(mono, 22050))
    assert rate == 22050 and (got[:, 0] == mono).all()

    stereo = rng.integers(-32768, 32768, (100, 2)).astype(np.int16)
    rate, got = decode_wav(encode_wav(stereo, 8000))
    assert rate == 8000 and got.shape == (100, 2) and (got == stereo).all()


def test_sniff_media():
    png = encode_png(np.zeros((2, 2), np.uint8))
    wav = encode_wav(np.zeros(4, np.int16), 8000)
    assert sniff_media(png) == "png"
    assert sniff_media(wav) == "wav"
    assert sniff_media(b"plain old text payload") is None
    assert sniff_media(b"") is None


def test_resize_nearest_known_grid():
    a = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    # 4x4 -> 2x2 nearest: picks rows/cols 0 and 2
    got = resize_nearest(a, 2, 2)
    assert got[:, :, 0].tolist() == [[0, 2], [8, 10]]


# ---------------------------------------------------------------------------
# JPEG (baseline grayscale)
# ---------------------------------------------------------------------------

def test_jpeg_flat_blocks_roundtrip_exact():
    """Flat 8x8 blocks with the all-ones quant table are DC-only with
    integer coefficients — the lossy format round-trips EXACTLY (this is
    the invariant the multimodal_real_jpeg oracle relies on)."""
    from nspc_etl_basic_spark.operators.codecs import (
        decode_jpeg_gray,
        encode_jpeg_gray,
        sniff_media,
    )

    arr = np.zeros((16, 16), np.uint8)
    arr[:8, :8], arr[:8, 8:], arr[8:, :8], arr[8:, 8:] = 17, 200, 255, 0
    data = encode_jpeg_gray(arr)
    assert sniff_media(data) == "jpeg"
    assert np.array_equal(decode_jpeg_gray(data), arr)


def test_jpeg_general_image_near_lossless_with_unit_quant():
    """Arbitrary content with quant=1: the only error source is IDCT
    float rounding — at most +/-1 per pixel. Covers non-multiple-of-8
    dims (edge padding + SOF0 crop) and DC prediction across blocks."""
    from nspc_etl_basic_spark.operators.codecs import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 33), dtype=np.uint8)
    back = decode_jpeg_gray(encode_jpeg_gray(img))
    assert back.shape == img.shape
    assert int(np.abs(back.astype(int) - img.astype(int)).max()) <= 1


def test_jpeg_lossy_quant_compresses_and_stays_close():
    from nspc_etl_basic_spark.operators.codecs import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(11)
    # smooth gradient image — lossy-compressible, bounded error
    x = np.linspace(0, 255, 64)
    img = np.clip(np.add.outer(x, x) / 2 + rng.normal(0, 2, (64, 64)), 0, 255).astype(np.uint8)
    q = np.full((8, 8), 16, np.int64)
    fine = encode_jpeg_gray(img)
    coarse = encode_jpeg_gray(img, quant=q)
    assert len(coarse) < len(fine)
    back = decode_jpeg_gray(coarse)
    assert int(np.abs(back.astype(int) - img.astype(int)).max()) <= 40
    assert float(np.abs(back.astype(int) - img.astype(int)).mean()) <= 8.0


def test_jpeg_rejects_out_of_scope():
    from nspc_etl_basic_spark.operators.codecs import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg_gray(b"\x89PNG\r\n\x1a\nnope")
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg_gray(np.zeros((8, 8), np.float64))
    # progressive marker (SOF2) refused
    good = encode_jpeg_gray(np.zeros((8, 8), np.uint8))
    bad = bytearray(good)
    idx = good.find(b"\xff\xc0")
    bad[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg_gray(bytes(bad))


def test_jpeg_byte_stuffing_survives():
    """Content tuned to emit 0xFF bytes in the entropy stream exercises
    the stuff/unstuff path; decode must still be exact for flat blocks."""
    from nspc_etl_basic_spark.operators.codecs import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    for v in range(0, 256, 7):
        arr = np.full((8, 8), v, np.uint8)
        assert np.array_equal(decode_jpeg_gray(encode_jpeg_gray(arr)), arr), v


def test_image_features_routes_jpeg_to_real_decode(spark):
    from nspc_etl_basic_spark.operators.codecs import encode_jpeg_gray
    from nspc_etl_basic_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_features,
    )

    arr = np.full((16, 8), 100, np.uint8)
    rows = [(1, bytearray(encode_jpeg_gray(arr)),
             ("image", 999, 999, None, None))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = image_features(df, require_real_decode=True).collect()[0]
    # real decode: dims from the JPEG header, not the (wrong) metadata
    assert (got.width, got.height) == (8, 16)
    assert abs(got.mean_intensity - 100 / 255.0) < 1e-6


def test_jpeg_color_444_and_420_roundtrip():
    """3-component baseline color: 4:4:4 within DCT rounding, 4:2:0
    within chroma-subsampling loss on gradients; odd dims crop right."""
    from nspc_etl_basic_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg_color,
    )

    rng = np.random.default_rng(5)
    x = np.linspace(0, 255, 48)
    base = np.add.outer(x, x) / 2
    img = np.stack([base, base[::-1], np.full_like(base, 100)], axis=-1)
    img = np.clip(img + rng.normal(0, 2, img.shape), 0, 255).astype(np.uint8)

    d444 = encode_jpeg_color(img, subsampling="444")
    b444 = decode_jpeg(d444)
    assert b444.shape == img.shape
    assert int(np.abs(b444.astype(int) - img.astype(int)).max()) <= 4

    d420 = encode_jpeg_color(img, subsampling="420")
    b420 = decode_jpeg(d420)
    assert len(d420) < len(d444)  # chroma subsampling actually compresses
    assert float(np.abs(b420.astype(int) - img.astype(int)).mean()) <= 4.0

    odd = img[:41, :35]
    bodd = decode_jpeg(encode_jpeg_color(odd, subsampling="420"))
    assert bodd.shape == odd.shape


def test_jpeg_color_flat_is_near_exact():
    """A flat color image: every block is DC-only in all three planes,
    so 4:2:0 loses nothing and the only error is the YCbCr<->RGB
    round-trip rounding (+/-1)."""
    from nspc_etl_basic_spark.operators.codecs import (
        decode_jpeg,
        encode_jpeg_color,
    )

    img = np.empty((32, 32, 3), np.uint8)
    img[:, :] = (200, 30, 90)
    back = decode_jpeg(encode_jpeg_color(img, subsampling="420"))
    assert int(np.abs(back.astype(int) - img.astype(int)).max()) <= 1


def test_image_features_decodes_color_jpeg(spark):
    from nspc_etl_basic_spark.operators.codecs import encode_jpeg_color
    from nspc_etl_basic_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_features,
    )

    img = np.empty((24, 16, 3), np.uint8)
    img[:, :] = (60, 120, 180)
    rows = [(7, bytearray(encode_jpeg_color(img)), ("image", 0, 0, None, None))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = image_features(df, require_real_decode=True).collect()[0]
    assert (got.width, got.height) == (16, 24)
    assert abs(got.mean_intensity - (60 + 120 + 180) / 3 / 255.0) < 0.01


def test_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn: byte-aligned restart markers every N MCUs with DC
    predictor resets — what camera/webtool encoders ship. Gray and
    color, including interval=1 (marker after every MCU)."""
    from nspc_etl_basic_spark.operators.codecs import (
        decode_jpeg,
        decode_jpeg_gray,
        encode_jpeg_color,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    for ri in (1, 3, 7):
        data = encode_jpeg_gray(img, restart_interval=ri)
        assert b"\xff\xdd" in data  # DRI segment present
        back = decode_jpeg_gray(data)
        assert int(np.abs(back.astype(int) - img.astype(int)).max()) <= 1

    cimg = np.empty((32, 48, 3), np.uint8)
    cimg[:, :] = (10, 200, 120)
    for sub in ("444", "420"):
        back = decode_jpeg(
            encode_jpeg_color(cimg, subsampling=sub, restart_interval=2)
        )
        assert int(np.abs(back.astype(int) - cimg.astype(int)).max()) <= 1
