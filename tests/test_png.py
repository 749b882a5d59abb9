"""Pure-NumPy PNG decoder (ref/png.py) against the reference's own fixture
images — the un-stubbing of S1 ingest for the reference's primary entry
format (examples/resume.cpp:9 cv::imread of images/*.png)."""

import os
import struct
import zlib

import numpy as np
import pytest

from tuatara_spark import fixtures as fx
from tuatara_spark.ops import multimodal as mm
from tuatara_spark.ref.png import decode_png

REF_IMAGES = "/root/reference/images"

EXPECTED_DIMS = {
    "funsd_0001129658.png": (1000, 754),
    "funsd_91372360.png": (1000, 814),
    "resume_example.png": (763, 607),
    "rotated_text.png": (206, 275),
    "table_english.png": (664, 1245),
}


def _encode_png(img: np.ndarray, color_type: int = 2,
                filter_cycle: bool = True) -> bytes:
    """Minimal independent PNG encoder for round-trip testing: exercises
    ALL five scanline filters (cycling per row) so each unfilter branch is
    validated against an independently-written forward transform."""
    h, w = img.shape[:2]
    c = {0: 1, 2: 3, 6: 4}[color_type]
    flat = img.reshape(h, w * c).astype(np.int32)
    rows = []
    prev = np.zeros(w * c, np.int32)
    for y in range(h):
        ft = (y % 5) if filter_cycle else 0
        row = flat[y]
        a = np.concatenate([np.zeros(c, np.int32), row[:-c]])
        ac = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
        if ft == 0:
            enc = row
        elif ft == 1:
            enc = (row - a) & 0xFF
        elif ft == 2:
            enc = (row - prev) & 0xFF
        elif ft == 3:
            enc = (row - ((a + prev) >> 1)) & 0xFF
        else:
            p = a + prev - ac
            pa, pb, pc = abs(p - a), abs(p - prev), abs(p - ac)
            pred = np.where((pa <= pb) & (pa <= pc), a,
                            np.where(pb <= pc, prev, ac))
            enc = (row - pred) & 0xFF
        rows.append(bytes([ft]) + bytes(enc.astype(np.uint8)))
        prev = row
    raw = zlib.compress(b"".join(rows))

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + \
            struct.pack(">I", zlib.crc32(t + d))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8,
                                         color_type, 0, 0, 0))
            + chunk(b"IDAT", raw) + chunk(b"IEND", b""))


@pytest.mark.parametrize("color_type", [0, 2, 6])
def test_roundtrip_all_filters(color_type):
    rng = np.random.default_rng(color_type)
    c = {0: 1, 2: 3, 6: 4}[color_type]
    src = rng.integers(0, 256, size=(40, 23, c), dtype=np.uint8)
    out = decode_png(_encode_png(src, color_type))
    if color_type == 0:
        np.testing.assert_array_equal(out, np.repeat(src, 3, axis=2))
    elif color_type == 2:
        np.testing.assert_array_equal(out, src)
    else:
        np.testing.assert_array_equal(out, src[..., :3])


@pytest.mark.parametrize("name", sorted(EXPECTED_DIMS))
def test_reference_fixture_decodes(name):
    with open(os.path.join(REF_IMAGES, name), "rb") as f:
        img = decode_png(f.read())
    h, w = EXPECTED_DIMS[name]
    assert img.shape == (h, w, 3)
    assert img.dtype == np.uint8
    # document scans are paper-dominated: bright mean, full dynamic range
    assert img.mean(dtype=np.float64) > 180
    assert img.min() < 64 and img.max() > 220


def test_decode_payload_dispatches_png():
    with open(os.path.join(REF_IMAGES, "rotated_text.png"), "rb") as f:
        buf = f.read()
    img = fx.decode_payload(buf)
    assert img.shape == (206, 275, 3)


def test_extract_media_meta_real_png(spark):
    """S1 ingest over the reference's own images through the Spark op:
    real width/height/luma, no stub."""
    rows = []
    for name in sorted(EXPECTED_DIMS):
        with open(os.path.join(REF_IMAGES, name), "rb") as f:
            rows.append((name, bytearray(f.read())))
    df = spark.createDataFrame(rows, "url string, html binary")
    meta = {r.url: r for r in mm.extract_media_meta(df).collect()}
    for name, (h, w) in EXPECTED_DIMS.items():
        r = meta[name]
        assert r.format == "png"
        assert (r.height, r.width) == (h, w)
        assert r.mean_luma is not None and r.mean_luma > 180


def test_extract_df_ingests_real_png(spark, weights):
    """The full Spark extraction engine accepts the reference's own PNG
    pages end-to-end (S1 ingest → detection → recognition): real decode,
    real detection on real ink. The stand-in recognizer only knows the
    synthetic glyph bank, so extracted TEXT is not asserted — regions and
    error-free flow are."""
    from tuatara_spark import engine as eng
    with open(os.path.join(REF_IMAGES, "rotated_text.png"), "rb") as f:
        buf = f.read()
    df = spark.createDataFrame([("rotated_text.png", bytearray(buf))],
                               "url string, html binary")
    r = eng.extract_df(df, weights=weights).collect()[0]
    assert r.error is None
    assert r.n_regions >= 1          # detector fires on real document ink


def test_encode_png_roundtrip_and_viz_dump(weights, tmp_path):
    """encode_png output must decode back exactly, and the S30 annotated
    dump writes a real PNG when asked to."""
    from tuatara_spark import viz
    from tuatara_spark.ref import pipeline as pl
    from tuatara_spark.ref.png import encode_png
    rng = np.random.default_rng(9)
    src = rng.integers(0, 256, size=(31, 17, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(src)), src)
    img, _ = fx.render_page("PngDump", 256, 256, 4)
    spans = pl.image_to_data(img, weights)
    path = viz.dump_annotated(img, spans, str(tmp_path / "page.png"))
    with open(path, "rb") as f:
        out = decode_png(f.read())
    np.testing.assert_array_equal(out, viz.annotate_page(img, spans))


def test_all_depths_palette_and_adam7_round_trip():
    """Full spec matrix: gray at 1/2/4/8/16 bit, RGB 8/16, palette at
    1/2/4/8 bit — each plain AND Adam7-interlaced — round-trips exactly
    (1-bit gray is the scanned-document format the OCR pipeline cares
    about; 16-bit reduces to the high byte by construction v·257)."""
    import numpy as np
    from tuatara_spark.ref import png as P
    rng = np.random.default_rng(5)
    for il in (False, True):
        for d in (1, 2, 4, 8, 16):
            if d < 8:
                step = 255 // ((1 << d) - 1)
                g = (rng.integers(0, 1 << d, (37, 53)) * step) \
                    .astype(np.uint8)
            else:
                g = rng.integers(0, 256, (37, 53), dtype=np.uint8)
            out = P.decode_png(P.encode_png(g, bit_depth=d, color_type=0,
                                            interlace=il))
            assert (out[..., 0] == g).all() and (out[..., 2] == g).all()
        for d in (8, 16):
            img = rng.integers(0, 256, (23, 41, 3), dtype=np.uint8)
            out = P.decode_png(P.encode_png(img, bit_depth=d,
                                            color_type=2, interlace=il))
            assert (out == img).all()
        for d in (1, 2, 4, 8):
            colors = rng.integers(0, 256, (1 << d, 3), dtype=np.uint8)
            img = colors[rng.integers(0, 1 << d, (19, 29))]
            out = P.decode_png(P.encode_png(img, bit_depth=d,
                                            color_type=3, interlace=il))
            assert (out == img).all()
    # Adam7 with empty passes (images smaller than the pass grid)
    for h, w in ((1, 1), (2, 3), (7, 5), (8, 8)):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (P.decode_png(P.encode_png(img, interlace=True))
                == img).all()


def test_binary_page_as_1bit_png_extracts(weights):
    """A rendered binary page shipped as a 1-bit interlaced PNG (the
    scanned-doc wire format) must extract byte-identically."""
    import numpy as np
    from tuatara_spark.ref import png as P, pipeline as pl
    img, lines = fx.render_page("Scan", 256, 256, 4)
    buf = P.encode_png(img[..., 0], bit_depth=1, color_type=0,
                       interlace=True)
    out = P.decode_png(buf)
    assert (out == img).all()
    r = pl.extract_page(out, weights)
    assert r["text"] == "\n".join(lines)
