"""Pure-NumPy BMP codec (ref/bmp.py): round trips, RLE8, top-down rows,
sub-byte palettes, dispatch."""

import struct

import numpy as np
import pandas as pd
import pytest

from tuatara_spark import fixtures as fx
from tuatara_spark.ops import multimodal
from tuatara_spark.ref import bmp as B


@pytest.mark.parametrize("shape", [(37, 53, 3), (16, 15, 3), (8, 1, 3)])
def test_24bit_round_trip_row_padding(shape):
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    assert (B.decode_bmp(B.encode_bmp(img)) == img).all()


def test_8bit_palette_round_trip():
    rng = np.random.default_rng(9)
    colors = rng.integers(0, 256, (17, 3), dtype=np.uint8)
    img = colors[rng.integers(0, 17, (23, 31))]
    assert (B.decode_bmp(B.encode_bmp(img, bpp=8)) == img).all()


def test_rle8_runs_absolute_eol_eob():
    pal = bytes([10, 20, 30, 0, 40, 50, 60, 0])
    rle = bytes([3, 0, 1, 1, 0, 0,      # row0: 3×c0, 1×c1, EOL
                 0, 3, 1, 0, 1, 0,      # row1: absolute [1,0,1] (padded)
                 1, 0, 0, 0,            # …1×c0, EOL
                 0, 1])                 # EOB (last row stays index 0)
    pix_off = 14 + 40 + 8
    hdr = (b"BM" + struct.pack("<IHHI", pix_off + len(rle), 0, 0, pix_off)
           + struct.pack("<IiihHIIiiII", 40, 4, 3, 1, 8, 1, len(rle),
                         0, 0, 2, 0))
    out = B.decode_bmp(hdr + pal + rle)
    assert (out[2] == [[30, 20, 10]] * 3 + [[60, 50, 40]]).all()
    assert (out[1][:3] == [[60, 50, 40], [30, 20, 10], [60, 50, 40]]).all()
    assert (out[0] == [[30, 20, 10]] * 4).all()


def test_top_down_negative_height():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    row_bytes = (4 * 3 + 3) // 4 * 4
    raw = np.zeros((5, row_bytes), np.uint8)
    raw[:, :12] = img[:, :, ::-1].reshape(5, 12)
    buf = bytearray(B.encode_bmp(img))
    buf[22:26] = struct.pack("<i", -5)
    assert (B.decode_bmp(bytes(buf[:54]) + raw.tobytes()) == img).all()


def test_1bit_palette_decode():
    """Hand-built 1-bit BMP (scanned-page flavor): MSB-first bits, 4-byte
    row padding, bottom-up."""
    pal = bytes([0, 0, 0, 0, 255, 255, 255, 0])   # 0=black, 1=white
    rows = np.zeros((2, 4), dtype=np.uint8)
    rows[0, 0] = 0b10100000                       # image BOTTOM row
    rows[1, 0] = 0b11000000
    pix_off = 14 + 40 + 8
    hdr = (b"BM" + struct.pack("<IHHI", pix_off + 8, 0, 0, pix_off)
           + struct.pack("<IiihHIIiiII", 40, 4, 2, 1, 1, 0, 8, 0, 0, 2, 0))
    out = B.decode_bmp(hdr + pal + rows.tobytes())
    assert (out[0, :, 0] == [255, 255, 0, 0]).all()   # top = stored row1
    assert (out[1, :, 0] == [255, 0, 255, 0]).all()


def test_dispatch_and_page_extraction(spark, weights):
    from tuatara_spark.ref import pipeline as pl
    img, lines = fx.render_page("B", 128, 128, 4)
    buf = B.encode_bmp(img, bpp=8)
    assert (np.asarray(fx.decode_payload(buf)) == img).all()
    assert pl.extract_page(fx.decode_payload(buf), weights)["text"] \
        == "\n".join(lines)
    df = spark.createDataFrame(pd.DataFrame(
        [{"url": "b", "html": buf}, {"url": "bad", "html": b"BM\x00\x01"}]))
    meta = {r.url: r for r in multimodal.extract_media_meta(df).collect()}
    assert meta["b"].format == "bmp" and meta["b"].width == 128
    assert meta["bad"].format == "error"


def test_garbage_never_hangs():
    rng = np.random.default_rng(15)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    buf = bytearray(B.encode_bmp(img))
    for _ in range(50):
        mutated = bytearray(buf)
        for _ in range(int(rng.integers(1, 5))):
            mutated[int(rng.integers(2, len(buf)))] = int(rng.integers(256))
        try:
            out = B.decode_bmp(bytes(mutated))
            assert out.dtype == np.uint8
        except Exception:
            pass
