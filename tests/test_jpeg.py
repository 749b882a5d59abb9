"""Pure-NumPy baseline JPEG codec (ref/jpeg.py): round trips, all mode
combinations, golden determinism, and the Spark ingest path end-to-end.

The codec is clean-room from ITU-T T.81 (decoder: SOF0 baseline, 4:4:4 /
4:2:0, restart intervals, byte stuffing; encoder: Annex K tables, fixture
grade). It un-stubs the highest-frequency real-ingest format the way
ref/png.py un-stubbed PNG (VERDICT r2 item 7)."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from tuatara_spark import fixtures as fx
from tuatara_spark.ops import multimodal
from tuatara_spark.ref import jpeg as J


def _gradient_rgb(h=60, w=100):
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack([x * 3 % 256, y * 2 % 256, (x + y) % 256],
                    axis=2).astype(np.uint8)


@pytest.mark.parametrize("kw", [
    {},
    {"restart_interval": 3},
    {"subsampling": "420"},
    {"subsampling": "420", "restart_interval": 2},
])
def test_round_trip_modes(kw):
    rgb = _gradient_rgb()
    out = J.decode_jpeg(J.encode_jpeg(rgb, quality=90, **kw))
    assert out.shape == rgb.shape and out.dtype == np.uint8
    err = np.abs(out.astype(int) - rgb.astype(int))
    assert float(err.mean()) < 1.5 and int(err.max()) <= 12


def test_restart_decode_equals_plain():
    """RSTn markers change the byte stream, not the pixels."""
    rgb = _gradient_rgb()
    a = J.decode_jpeg(J.encode_jpeg(rgb, quality=90))
    b = J.decode_jpeg(J.encode_jpeg(rgb, quality=90, restart_interval=1))
    assert (a == b).all()


def test_gray_and_odd_dims():
    g = (np.arange(41)[:, None] * 5 + np.arange(53)[None, :]).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(g, quality=95))
    assert out.shape == (41, 53, 3)
    assert (out[..., 0] == out[..., 1]).all()
    assert float(np.abs(out[..., 0].astype(int) - g.astype(int)).mean()) < 1.0
    odd = _gradient_rgb(57, 99)
    assert J.decode_jpeg(J.encode_jpeg(odd, subsampling="420")).shape \
        == (57, 99, 3)


def test_rendered_page_thresholds_survive():
    """Binary-ink pages survive q95 JPEG with error ≤ a few greylevels —
    far inside the pipeline's <128 ink threshold, so extraction semantics
    are unchanged by the lossy hop."""
    page, _ = fx.render_page("abcdEFGH0123", 256, 256, 4)
    out = J.decode_jpeg(J.encode_jpeg(page, quality=95))
    ink_in = page[..., 0] < 128
    ink_out = out[..., 0] < 128
    assert (ink_in == ink_out).all()


def test_golden_determinism():
    """Encoder and decoder are bit-deterministic (frozen digests; a NumPy
    or refactor regression flips these)."""
    page, _ = fx.render_page("Tu4t4r4!", 256, 256, 4)
    buf = J.encode_jpeg(page, quality=90)
    assert J.encode_jpeg(page, quality=90) == buf
    d1 = hashlib.sha256(buf).hexdigest()
    d2 = hashlib.sha256(J.decode_jpeg(buf).tobytes()).hexdigest()
    assert (d1, d2) == (
        "ced3247a3e029172aa8f12847e0a7d3d9fd40d3cabc9a93bf0d718bb853b02fd",
        "390e36516ee80e698de37794357d83a3aa9d47accac1d3a3119e4f5ac4c0243b")


def test_decode_payload_dispatch_and_malformed():
    page, _ = fx.render_page("x", 128, 128, 4)
    buf = J.encode_jpeg(page, quality=95)
    img = fx.decode_payload(buf)
    assert img.shape == (128, 128, 3)
    with pytest.raises(Exception):
        fx.decode_payload(buf[:40])            # truncated header
    with pytest.raises(Exception):
        J.decode_jpeg(b"\xff\xd8\xff" + b"\x00" * 10)


def test_media_meta_jpeg_real_decode(spark):
    """extract_media_meta now reports real jpeg rows (was 'stubbed')."""
    page, _ = fx.render_page("ab", 256, 256, 4)
    rows = pd.DataFrame({
        "url": ["j1", "bad"],
        "html": [J.encode_jpeg(page, quality=95), b"\xff\xd8\xff\xe0junk"],
    })
    df = spark.createDataFrame(rows)
    got = {r.url: r for r in multimodal.extract_media_meta(df).collect()}
    assert got["j1"].format == "jpeg"
    assert (got["j1"].width, got["j1"].height) == (256, 256)
    assert got["j1"].mean_luma == pytest.approx(
        float(J.decode_jpeg(rows["html"][0]).mean(dtype=np.float64)))
    assert got["bad"].format == "error"     # malformed → error row


def test_engine_extracts_jpeg_pages(spark, weights):
    """End-to-end: JPEG-encoded rendered pages through the full extraction
    engine give byte-identical text to the TPAGE originals (the <128 ink
    threshold absorbs the lossy hop at q95)."""
    from tuatara_spark import engine
    pages = fx.make_pages(6, seed=31)
    jp = pages.copy()
    jp["html"] = [J.encode_jpeg(fx.decode_payload(b), quality=95)
                  for b in pages["html"]]
    df = spark.createDataFrame(jp[["url", "warc_ts", "html", "lang"]])
    out = {r.url: r.text for r in
           engine.extract_df(df, weights=weights).collect()}
    truth = dict(zip(pages["url"], pages["text"]))
    assert out == truth


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(9, 40), st.integers(9, 40),
       st.sampled_from(["444", "420"]))
def test_fuzz_round_trip_bounded_error(seed, h, w, sub):
    """Property: any uint8 RGB image round-trips encode→decode at q90 with
    bounded error and exact shape — no crashes, no shape drift, for
    arbitrary dims (incl. non-multiples of 8/16) and both subsamplings."""
    rng = np.random.default_rng(seed)
    # smooth-ish content (quantization error on pure noise is unbounded
    # by design — JPEG is a transform codec, not lossless)
    base = rng.integers(0, 256, size=(4, 4, 3))
    img = np.kron(base, np.ones((16, 16, 1))).astype(np.uint8)[:h, :w]
    out = J.decode_jpeg(J.encode_jpeg(img, quality=90, subsampling=sub))
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
    err = np.abs(out.astype(int) - img.astype(int))
    assert float(err.mean()) < 12.0


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_fuzz_decoder_never_hangs_on_garbage(payload):
    """Property: arbitrary bytes (with or without a JPEG SOI prefix) either
    decode or raise — never hang, never return a malformed array."""
    for buf in (payload, b"\xff\xd8\xff" + payload):
        try:
            out = J.decode_jpeg(buf)
        except Exception:
            continue
        assert out.ndim == 3 and out.shape[2] == 3 and out.dtype == np.uint8


@pytest.mark.parametrize("shape,sub,ri", [
    ((64, 64, 3), "444", 0), ((33, 49, 3), "420", 0),
    ((17, 23), "444", 0), ((48, 80, 3), "420", 4), ((19, 37), "444", 3),
])
def test_progressive_decode_bit_identical(shape, sub, ri):
    """SOF2 progressive encodes the SAME quantized coefficients through
    the multi-scan script (DC first/refine, AC spectral bands at two SA
    levels, EOB/ZRL/correction-bit paths) — so progressive decode must
    equal baseline decode bit-for-bit, including with restart markers."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    img = ((img.astype(np.int32) + np.roll(img, 1, 0)
            + np.roll(img, 1, 1)) // 3).astype(np.uint8)
    base = J.decode_jpeg(J.encode_jpeg(img, restart_interval=ri,
                                       subsampling=sub))
    prog = J.decode_jpeg(J.encode_jpeg(img, restart_interval=ri,
                                       subsampling=sub, progressive=True))
    assert (base == prog).all()


def test_16bit_quant_tables():
    """Pq=1 DQT segments (16-bit entries) decode identically to the same
    table written 8-bit."""
    img = _gradient_rgb(40, 56)
    buf = J.encode_jpeg(img, quality=90)
    # rewrite each 8-bit DQT as a 16-bit one (same values, big-endian)
    out = bytearray()
    pos = 0
    while pos < len(buf):
        if buf[pos] == 0xFF and buf[pos + 1] == 0xDB:
            (seglen,) = np.frombuffer(buf[pos + 2:pos + 4], ">u2")
            seg = buf[pos + 4:pos + 2 + seglen]
            tq, entries = seg[0] & 0xF, np.frombuffer(seg[1:65], np.uint8)
            payload = bytes([0x10 | tq]) + entries.astype(">u2").tobytes()
            out += b"\xff\xdb" + int(len(payload) + 2).to_bytes(2, "big") \
                + payload
            pos += 2 + seglen
        else:
            out.append(buf[pos])
            pos += 1
    assert (J.decode_jpeg(bytes(out)) == J.decode_jpeg(buf)).all()


def test_fuzz_progressive_mutations_never_hang():
    """Byte-level corruption of a valid progressive file must decode or
    raise — never hang/crash the worker (web JPEGs arrive truncated and
    bit-flipped)."""
    rng = np.random.default_rng(12)
    img = _gradient_rgb(32, 48)
    buf = bytearray(J.encode_jpeg(img, progressive=True))
    for _ in range(60):
        mutated = bytearray(buf)
        for _ in range(int(rng.integers(1, 6))):
            mutated[int(rng.integers(2, len(buf)))] = int(rng.integers(256))
        try:
            out = J.decode_jpeg(bytes(mutated))
            assert out.dtype == np.uint8 and out.ndim == 3
        except Exception:
            pass
    # truncations at every region boundary
    for cut in (2, 20, len(buf) // 4, len(buf) // 2, len(buf) - 3):
        try:
            J.decode_jpeg(bytes(buf[:cut]))
        except Exception:
            pass
