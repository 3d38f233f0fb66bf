"""Spec evidence for the pure-stdlib PNG codec (operators/png.py).

The decoder's unfiltering is tested against an INDEPENDENT forward
implementation of the PNG filter algorithms written here from the spec
(RFC 2083 §6) — a round-trip through our own encoder alone would only
prove self-consistency, not spec compliance.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from development_of_a_streaming_pipeline_to_ingest_dcache_billing_data_to_hive_hdfs_spark.operators.png import (
    PNG_SIGNATURE,
    decode_png,
    encode_png,
    image_features,
    is_png,
    resize_nearest,
)

# ---------------------------------------------------------------------
# independent forward filtering (spec RFC 2083 §6.2-6.6), test-side only
# ---------------------------------------------------------------------


def _paeth_ref(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_row(ftype: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    out = bytearray()
    for i in range(len(row)):
        left = row[i - bpp] if i >= bpp else 0
        up = prev[i]
        up_left = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            f = row[i]
        elif ftype == 1:
            f = (row[i] - left) & 0xFF
        elif ftype == 2:
            f = (row[i] - up) & 0xFF
        elif ftype == 3:
            f = (row[i] - ((left + up) >> 1)) & 0xFF
        else:
            f = (row[i] - _paeth_ref(left, up, up_left)) & 0xFF
        out.append(f)
    return bytes(out)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _build_png(pixels: np.ndarray, filter_for_row) -> bytes:
    """Hand-assemble a PNG with a chosen filter type per scanline."""
    h, w, ch = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = pixels.reshape(h, w * ch)
    prev = bytes(w * ch)
    raw = bytearray()
    for y in range(h):
        ftype = filter_for_row(y)
        row = flat[y].tobytes()
        raw += bytes([ftype]) + _filter_row(ftype, row, prev, ch)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_decode_every_filter_type_against_spec(channels):
    rng = np.random.default_rng(42 + channels)
    pixels = rng.integers(0, 256, size=(10, 7, channels), dtype=np.uint8)
    # rows cycle through all 5 filter types, so each is exercised with
    # real up/left/up-left neighbors
    png = _build_png(pixels, lambda y: y % 5)
    out = decode_png(png)
    assert out.shape == (10, 7, channels)
    np.testing.assert_array_equal(out, pixels)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_decode_single_filter_uniform(ftype):
    rng = np.random.default_rng(ftype)
    pixels = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_png(_build_png(pixels, lambda y: ftype)), pixels
    )


@pytest.mark.parametrize(
    "shape", [(1, 1, 1), (1, 1, 3), (2, 3, 4), (17, 13, 3), (1, 64, 2)]
)
def test_encode_decode_round_trip(shape):
    rng = np.random.default_rng(7)
    pixels = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(pixels))
    np.testing.assert_array_equal(out, pixels)


def test_encode_accepts_2d_gray():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = decode_png(encode_png(gray))
    np.testing.assert_array_equal(out, gray[:, :, None])


def test_is_png_and_rejections():
    assert not is_png(None)
    assert not is_png(b"\x89PNG")  # truncated signature
    assert not is_png(b"JFIF" * 4)
    assert is_png(encode_png(np.zeros((2, 2, 3), dtype=np.uint8)))

    with pytest.raises(ValueError, match="bad signature"):
        decode_png(b"not a png at all")
    # 16-bit depth unsupported
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    png16 = PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(png16)
    # palette color type unsupported
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    png_pal = PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="color type"):
        decode_png(png_pal)
    # truncated pixel data
    good = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_png(good[:-20])


def test_decoder_skips_ancillary_chunks():
    pixels = np.full((2, 2, 3), 9, dtype=np.uint8)
    png = encode_png(pixels)
    # splice a tEXt chunk between IHDR and IDAT — decoders must ignore it
    ihdr_end = 8 + 12 + 13  # sig + IHDR chunk (len 13)
    spliced = (
        png[:ihdr_end] + _chunk(b"tEXt", b"comment\x00hi") + png[ihdr_end:]
    )
    np.testing.assert_array_equal(decode_png(spliced), pixels)


def test_resize_nearest():
    pixels = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    up = resize_nearest(pixels, 12, 8)
    assert up.shape == (8, 12, 3)
    same = resize_nearest(pixels, 6, 4)
    np.testing.assert_array_equal(same, pixels)
    down = resize_nearest(pixels, 3, 2)
    assert down.shape == (2, 3, 3)
    # nearest-neighbor: every output pixel exists in the input
    flat_in = {tuple(px) for px in pixels.reshape(-1, 3)}
    assert all(tuple(px) in flat_in for px in down.reshape(-1, 3))


def test_image_features_shape_and_semantics():
    black = np.zeros((8, 16, 3), dtype=np.uint8)
    white = np.full((8, 16, 3), 255, dtype=np.uint8)
    fb, fw = image_features(black), image_features(white)
    assert fb.shape == (16,) and fb.dtype == np.float32
    assert np.all(np.isfinite(fb)) and np.all(np.isfinite(fw))
    assert fb[0] == 0.0 and fw[0] == pytest.approx(1.0, abs=1e-3)  # luma mean
    assert fb[14] == pytest.approx(2.0)  # aspect ratio w/h
    # histogram: all mass in the bottom bin for black, top bin for white
    assert fb[10] == 1.0 and fw[13] == 1.0
    # deterministic
    np.testing.assert_array_equal(fb, image_features(black))
    # gradients: a vertical step edge has y-gradient, no x-gradient
    step = np.zeros((8, 8, 3), dtype=np.uint8)
    step[4:] = 255
    fs = image_features(step)
    assert fs[9] > 0 and fs[8] == 0.0


def test_encode_rejects_bad_shapes():
    with pytest.raises(ValueError):
        encode_png(np.zeros((2, 2, 5), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_png(np.zeros(8, dtype=np.uint8))


# ---------------------------------------------------------------------
# property-based round trips (hypothesis)
# ---------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def pixel_arrays(draw):
    h = draw(st.integers(min_value=1, max_value=12))
    w = draw(st.integers(min_value=1, max_value=12))
    ch = draw(st.sampled_from([1, 2, 3, 4]))
    data = draw(
        st.lists(
            st.integers(min_value=0, max_value=255),
            min_size=h * w * ch,
            max_size=h * w * ch,
        )
    )
    return np.array(data, dtype=np.uint8).reshape(h, w, ch)


@settings(max_examples=60, deadline=None)
@given(pixel_arrays())
def test_property_encode_decode_identity(pixels):
    np.testing.assert_array_equal(decode_png(encode_png(pixels)), pixels)


@settings(max_examples=40, deadline=None)
@given(
    pixel_arrays(),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=10),
)
def test_property_resize_shape_and_membership(pixels, w, h):
    out = resize_nearest(pixels, w, h)
    assert out.shape == (h, w, pixels.shape[2])
    # nearest-neighbor never invents pixel values
    src = {tuple(px) for px in pixels.reshape(-1, pixels.shape[2])}
    assert all(tuple(px) in src for px in out.reshape(-1, out.shape[2]))


@settings(max_examples=40, deadline=None)
@given(pixel_arrays())
def test_property_features_finite_and_deterministic(pixels):
    f = image_features(pixels)
    assert f.shape == (16,) and np.all(np.isfinite(f))
    np.testing.assert_array_equal(f, image_features(pixels))
