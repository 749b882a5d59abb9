"""Pure-NumPy TIFF codec (ref/tiff.py): compression × strip × predictor
matrix, bilevel scans, big-endian, palette, dispatch, fuzz."""

import struct

import numpy as np
import pandas as pd
import pytest

from tuatara_spark import fixtures as fx
from tuatara_spark.ops import multimodal
from tuatara_spark.ref import tiff as T


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
@pytest.mark.parametrize("rps", [0, 7])
def test_round_trip_matrix(comp, rps):
    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (23, 31, 3), dtype=np.uint8)
    out = T.decode_tiff(T.encode_tiff(img, comp, rows_per_strip=rps))
    assert (out == img).all()
    g = rng.integers(0, 256, (19, 29), dtype=np.uint8)
    out = T.decode_tiff(T.encode_tiff(g, comp, rows_per_strip=rps))
    assert (out[..., 1] == g).all()


def test_lzw_predictor_and_width_growth():
    """Horizontal differencing + enough data to exercise 10/11/12-bit
    codes and the table reset."""
    rng = np.random.default_rng(10)
    g = rng.integers(0, 256, (300, 400), dtype=np.uint8)
    assert (T.decode_tiff(T.encode_tiff(g, "lzw"))[..., 0] == g).all()
    img = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
    out = T.decode_tiff(T.encode_tiff(img, "lzw", predictor=True))
    assert (out == img).all()


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
def test_bilevel_scanned_page(comp, weights):
    """1-bit multi-strip TIFF — THE archival scanned-document format —
    round-trips and extracts byte-identically."""
    from tuatara_spark.ref import pipeline as pl
    img, lines = fx.render_page("Tt", 256, 256, 4)
    out = T.decode_tiff(T.encode_tiff(img, comp, bilevel=True,
                                      rows_per_strip=64))
    assert (out == img).all()
    assert pl.extract_page(out, weights)["text"] == "\n".join(lines)


def test_big_endian_and_white_is_zero():
    """Hand-flip a little-endian bilevel file's photometric to
    WhiteIsZero (inverted) and a hand-built big-endian gray image."""
    img, _ = fx.render_page("a", 128, 128, 4)
    buf = bytearray(T.encode_tiff(img, bilevel=True))
    # photometric tag 262 value 1 → 0 flips meaning; re-decoding must
    # invert the plane
    le = T.decode_tiff(bytes(buf))
    i = buf.find(struct.pack("<HHI", 262, 3, 1))
    buf[i + 8] = 0
    inv = T.decode_tiff(bytes(buf))
    assert (inv == 255 - le).all()
    # minimal big-endian 8-bit gray 2×3
    g = np.array([[1, 2, 3], [250, 251, 252]], dtype=np.uint8)
    ifd = [(256, 3, 1, 3), (257, 3, 1, 2), (258, 3, 1, 8), (259, 3, 1, 1),
           (262, 3, 1, 1), (273, 4, 1, 0), (277, 3, 1, 1),
           (278, 3, 1, 2), (279, 4, 1, 6)]
    data_off = 8 + 2 + 12 * len(ifd) + 4
    out = bytearray(b"MM\x00*" + struct.pack(">I", 8)
                    + struct.pack(">H", len(ifd)))
    for tag, typ, cnt, val in ifd:
        if tag == 273:
            val = data_off
        body = struct.pack(">H", val) + b"\x00\x00" if typ == 3 \
            else struct.pack(">I", val)
        out += struct.pack(">HHI", tag, typ, cnt) + body
    out += struct.pack(">I", 0) + g.tobytes()
    assert (T.decode_tiff(bytes(out))[..., 0] == g).all()


def test_dispatch_and_meta(spark):
    img, _ = fx.render_page("a", 128, 128, 4)
    buf = T.encode_tiff(img, "lzw", bilevel=True)
    assert (np.asarray(fx.decode_payload(buf)) == img).all()
    df = spark.createDataFrame(pd.DataFrame(
        [{"url": "t", "html": buf},
         {"url": "bad", "html": b"II*\x00" + b"\x02" * 8}]))
    meta = {r.url: r for r in multimodal.extract_media_meta(df).collect()}
    assert meta["t"].format == "tiff" and meta["t"].width == 128
    assert meta["bad"].format == "error"


def test_garbage_never_hangs():
    rng = np.random.default_rng(16)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    buf = bytearray(T.encode_tiff(img, "lzw"))
    for _ in range(50):
        mutated = bytearray(buf)
        for _ in range(int(rng.integers(1, 5))):
            mutated[int(rng.integers(4, len(buf)))] = int(rng.integers(256))
        try:
            out = T.decode_tiff(bytes(mutated))
            assert out.dtype == np.uint8
        except Exception:
            pass
