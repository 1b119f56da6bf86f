"""The pure-numpy PNG codec (multimodal/png.py) -- the one REAL
byte-format decode in the multimodal family (r8 verdict task 7).

The encoder cycles ALL FIVE scanline filter predictors, so the
hypothesis round-trip is a genuine decoder proof: a broken Sub/Up/
Average/Paeth unfilter fails on some generated image.  The registry
entry x70 adds the cross-engine half (DuckDB recomputes the decoded
pixel stats from the synthesis formula without seeing a PNG byte).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from conecta_spark.multimodal.png import PNG_SIG, decode_png, encode_png


@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_roundtrip_is_identity(w, h, seed):
    img = np.random.RandomState(seed).randint(0, 256, (h, w)).astype(
        np.uint8
    )
    data = encode_png(img)
    assert data[:8] == PNG_SIG
    assert np.array_equal(decode_png(data), img)


@given(
    w=st.integers(min_value=1, max_value=16),
    fill=st.integers(min_value=0, max_value=255),
)
@settings(max_examples=20, deadline=None)
def test_roundtrip_on_constant_and_gradient_images(w, fill):
    # constant images stress Average/Paeth ties; gradients stress Sub/Up
    h = 10  # >= 5 rows so every filter type appears at least twice
    const = np.full((h, w), fill, dtype=np.uint8)
    grad = (
        (np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 13) % 256
    ).astype(np.uint8)
    for img in (const, grad):
        assert np.array_equal(decode_png(encode_png(img)), img)


def test_corruption_fails_crc():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = bytearray(encode_png(img))
    data[45] ^= 0xFF  # inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_non_png_and_truncation_rejected():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"hello world, not a png")
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    with pytest.raises(ValueError, match="truncated"):
        decode_png(encode_png(img)[:-10])


def test_out_of_scope_color_type_rejected():
    """An RGB IHDR must be refused loudly, not mis-decoded."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)  # color type 2
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="grayscale"):
        decode_png(PNG_SIG + chunk)


def test_decode_images_dispatches_on_png_magic(spark):
    """decode_images must route a REAL PNG payload through the real
    decoder (true dims, format 'png', thumb = first 16 PIXEL bytes)
    while non-PNG payloads keep the documented fake-codec arithmetic --
    the dispatch can never misfire on UTF-8 text (0x89 is not a valid
    UTF-8 leading byte)."""
    from conecta_spark.multimodal.ops import decode_images

    img = (np.arange(21 * 5) % 256).astype(np.uint8).reshape(5, 21)
    rows = [(1, bytes(encode_png(img))), (2, "plain text".encode())]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_images(df).collect()}
    assert (got[1].width, got[1].height, got[1].format) == (21, 5, "png")
    assert bytes(got[1].thumb) == img.tobytes()[:16]
    assert got[2].format == "fake"
    assert got[2].width == 16 + b"p"[0] % 240
