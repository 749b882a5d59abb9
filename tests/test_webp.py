"""VP8L (WebP-lossless) codec: round trips, decoder-only bitstream paths
(color cache, LZ77 linear distances, SUBTRACT_GREEN, simple codes),
out-of-scope features erroring loudly, and corruption fuzz."""

import struct

import numpy as np
import pytest

from tuatara_spark import fixtures as fx
from tuatara_spark.ref import webp as WB


def test_round_trip_matrix():
    rng = np.random.default_rng(1)
    for shape in [(1, 1, 3), (2, 3, 4), (7, 5, 3), (32, 17, 4),
                  (64, 64, 3)]:
        img = rng.integers(0, 256, size=shape).astype(np.uint8)
        out = WB.decode_webp(WB.encode_webp(img))
        assert out.shape == img.shape and (out == img).all(), shape


def test_round_trip_degenerate_distributions():
    # constant image (single-symbol codes on every channel)
    img = np.full((16, 16, 3), 7, np.uint8)
    assert (WB.decode_webp(WB.encode_webp(img)) == img).all()
    # two-symbol channels (simple prefix code form)
    img = np.zeros((8, 8, 3), np.uint8)
    img[::2] = (255, 1, 128)
    assert (WB.decode_webp(WB.encode_webp(img)) == img).all()
    # heavy skew drives long Huffman codes through the length limiter
    vals = np.concatenate([np.zeros(4000), np.arange(96).repeat(1)])
    rng = np.random.default_rng(2)
    rng.shuffle(vals)
    img = vals[:4096].reshape(64, 64, 1).repeat(3, axis=2).astype(np.uint8)
    assert (WB.decode_webp(WB.encode_webp(img)) == img).all()


def test_rendered_page_compresses():
    page, _ = fx.render_page("webp", 256, 256, 4)
    buf = WB.encode_webp(page)
    assert (WB.decode_webp(buf) == page).all()
    assert len(buf) < page.nbytes // 4         # Huffman actually helps
    # dispatches through the generic payload decoder too
    assert (np.asarray(fx.decode_payload(buf)) == page).all()


def _raw_stream(w, h, body_bits):
    """Hand-assemble a VP8L container around pre-built bitstream bits
    ((value, nbits) pairs, LSB-first) for decoder-only paths."""
    bw = WB._BitWriter()
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(0, 1)
    bw.bits(0, 3)
    for v, n in body_bits:
        bw.bits(v, n)
    payload = bytes([0x2F]) + bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _simple_code(sym):
    # simple form, 1 symbol, 8-bit
    return [(1, 1), (0, 1), (1, 1), (sym, 8)]


def test_decoder_lz77_and_subtract_green():
    # 4x1 image: literal pixel then a backref copying it 3 times, under
    # SUBTRACT_GREEN. green=5, stored red/blue are deltas (r-g, b-g).
    bits = [(1, 1), (2, 2),      # one transform: type 2 subtract-green
            (0, 1),              # no more transforms
            (0, 1),              # no color cache
            (0, 1)]              # no meta codes
    # green code: two symbols {5, 257}: 257 = backref length code 1
    bits += [(1, 1), (1, 1), (1, 1), (5, 8), (0, 8)]
    # simple 2-symbol form can only name 8-bit symbols, so symbol 257
    # can't ride it — use full-code form for green instead below.
    # Rebuild: full code with lengths for syms 5 and 257.
    bits = bits[:5]
    # full code: ncl=19; code-length-code: {1:1-bit? need lens for
    # symbols 1 (len used twice)}: give length-symbol 1 a 1-bit code and
    # 0 a 1-bit code
    bits += [(0, 1)]             # full form
    bits += [(19 - 4, 4)]
    cl_lens = {0: 1, 1: 1}
    for s in WB._CL_ORDER:
        bits += [(cl_lens.get(s, 0), 3)]
    # cl canonical: sym0 -> code 0, sym1 -> code 1 (both length 1)
    bits += [(1, 1), (4, 3), (258 - 2, 10)]  # explicit max_symbol = 258
    # lengths: sym 0..4 -> 0 (code '0'), sym5 -> 1 (code '1'),
    # 6..256 -> 0 ×251, sym257 -> 1
    seq = [0] * 5 + [1] + [0] * 251 + [1]
    for ln in seq:
        bits += [(cl_code, 1) for cl_code in ([0] if ln == 0 else [1])]
    # red/blue/alpha codes: deltas r-g = 10-5 = 5? choose stored r=200,
    # b=100, a=255 (post subtract-green: r_final=(200+g)%256)
    bits += _simple_code(200)    # red (stored delta; +g mod 256 on read)
    bits += _simple_code(100)    # blue (stored delta)
    bits += _simple_code(255)    # alpha
    bits += _simple_code(13)     # distance code symbol 13: 5 extra bits
    # pixel stream (canonical green: sym5 len1 -> code 0, sym257 -> 1):
    bits += [(0, 1)]             # green literal 5; r/b/a codes read 0 bits
    bits += [(1, 1)]             # green 257: LZ77 length = 2 (no extras)
    bits += [(24, 5)]            # distance extras: (3<<5)+24+1 = 121
    #                              -> dcode 121 -> LINEAR dist = 1
    out = WB.decode_webp(_raw_stream(3, 1, bits))
    assert out.shape == (1, 3, 3)
    # subtract-green undone: r = (200+5)%256, g = 5, b = (100+5)%256
    assert (out == np.array([[[205, 5, 105]] * 3])).all()

    # a close-neighbor 2D distance that reaches BEFORE the image start
    # still refuses loudly: dcode 120 -> (8, 7) -> dist 7*3+8 = 29 > i=1
    bits[-1] = (23, 5)
    with pytest.raises(ValueError, match="backref before image start"):
        WB.decode_webp(_raw_stream(3, 1, bits))


def test_decoder_color_cache_path():
    # 3x1 image, color cache on: literal pixel, then a cache hit for the
    # same pixel, then another literal. cache index of argb(255,9,9,9):
    k = (0x1E35A7BD * ((255 << 24) | (9 << 16) | (9 << 8) | 9)
         & 0xFFFFFFFF) >> (32 - 1)
    bits = [(0, 1),              # no transforms
            (1, 1), (1, 4),      # color cache, 1 bit -> 2 entries
            (0, 1)]              # no meta
    # green alphabet = 256+24+2 = 282; symbols used: 9 (literal) and
    # 280+k (cache hit) -> full code
    bits += [(0, 1), (19 - 4, 4)]
    cl_lens = {0: 1, 1: 1}
    for s in WB._CL_ORDER:
        bits += [(cl_lens.get(s, 0), 3)]
    cache_sym = 280 + k
    bits += [(1, 1), (4, 3), (cache_sym + 1 - 2, 10)]
    seq = [0] * 9 + [1] + [0] * (cache_sym - 10) + [1]
    assert len(seq) == cache_sym + 1
    for ln in seq:
        bits += [(0, 1) if ln == 0 else (1, 1)]
    bits += _simple_code(9)      # red
    bits += _simple_code(9)      # blue
    bits += _simple_code(255)    # alpha
    bits += _simple_code(0)      # distance
    # stream: literal(green 9 -> code 0), cache hit (code 1), literal
    bits += [(0, 1), (1, 1), (0, 1)]
    out = WB.decode_webp(_raw_stream(3, 1, bits))
    assert out.shape == (1, 3, 3)
    assert (out == 9).all()


def test_out_of_scope_features_error():
    # a meta-prefix header followed by nothing refuses (truncation, not
    # silence) — the entropy image has no bits to decode from
    bits = [(0, 1), (0, 1), (1, 1)]
    with pytest.raises(ValueError, match="truncated|prefix"):
        WB.decode_webp(_raw_stream(2, 2, bits))
    # lossy VP8 chunk refuses
    lossy = (b"RIFF" + struct.pack("<I", 12) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="lossy"):
        WB.decode_webp(lossy)


def test_fuzz_never_silent():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(24, 24, 3)).astype(np.uint8)
    buf = WB.encode_webp(img)
    for cut in range(0, len(buf), max(1, len(buf) // 19)):
        try:
            WB.decode_webp(buf[:cut])
        except ValueError:
            pass
    flips = 0
    for pos in range(12, len(buf), max(1, len(buf) // 41)):
        m = bytearray(buf)
        m[pos] ^= 0xFF
        try:
            out = WB.decode_webp(bytes(m))
            # a flip may land in padding / unused code space and still
            # decode — but it must produce SOME image, never crash
            assert out.dtype == np.uint8
        except (ValueError, KeyError):
            flips += 1
    assert flips > 0   # corruption is usually detected


def test_uniform_histogram_round_trips():
    """Regression (review): images whose channel histograms are uniform
    collapse the code-length code to ONE symbol, which reads 0 bits —
    the encoder must also write 0 bits or the stream desyncs."""
    img = np.tile(np.arange(256, dtype=np.uint8).reshape(16, 16), (4, 4))
    img = img.reshape(64, 64, 1).repeat(3, axis=2)
    assert (WB.decode_webp(WB.encode_webp(img)) == img).all()
    img2 = (np.arange(4096) % 4).astype(np.uint8) \
        .reshape(64, 64, 1).repeat(3, axis=2)
    assert (WB.decode_webp(WB.encode_webp(img2)) == img2).all()


def test_symbol_beyond_alphabet_refuses():
    """Regression (review): a malformed stream declaring code lengths
    for symbols beyond the channel alphabet must raise, not wrap pixel
    values mod 256."""
    bits = [(0, 1), (0, 1), (0, 1)]          # no transforms/cache/meta
    bits += _simple_code(1)                  # green: single symbol
    # red: full code claiming max_symbol=302 with a length at sym 300
    bits += [(0, 1), (19 - 4, 4)]
    cl_lens = {0: 1, 1: 1}
    for s in WB._CL_ORDER:
        bits += [(cl_lens.get(s, 0), 3)]
    bits += [(1, 1), (4, 3), (302 - 2, 10)]
    seq = [0] * 300 + [1] + [0]
    for ln in seq:
        bits += [(0, 1) if ln == 0 else (1, 1)]
    with pytest.raises(ValueError, match="beyond alphabet"):
        WB.decode_webp(_raw_stream(2, 1, bits))


def _vp8_keyframe_webp(w: int, h: int) -> bytes:
    """Hand-built RFC 6386 §9.1 lossy WebP: 3-byte frame tag (keyframe,
    version 0, show_frame, zero partition size), the 9d 01 2a start
    code, then 14-bit width/height in two LE uint16s (upscale bits 0)."""
    frame = (b"\x00\x00\x00" + b"\x9d\x01\x2a"
             + struct.pack("<HH", w, h))
    chunk = b"VP8 " + struct.pack("<I", len(frame)) + frame
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _vp8x_webp(w: int, h: int, inner: bytes = b"") -> bytes:
    head = (b"\x00" + b"\x00" * 3
            + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little"))
    chunk = b"VP8X" + struct.pack("<I", len(head)) + head + inner
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_lossy_webp_dimensions_from_public_headers(spark):
    """VP8/VP8X metadata parses from the RFC 6386/9649 headers (the
    dominant wild-WebP case un-stubbed); malformed payloads stay error
    rows; VP8X wrapping a VP8L stream still gets the FULL decode."""
    import pandas as pd
    from tuatara_spark.ops import multimodal as mm
    img = np.full((8, 10, 3), 200, np.uint8)
    vp8l = WB.encode_webp(img)
    # re-wrap the VP8L chunk inside a VP8X container
    body = _vp8x_webp(10, 8)[12:] + vp8l[12:]
    vp8x_wrapped = (b"RIFF" + struct.pack("<I", 4 + len(body))
                    + b"WEBP" + body)
    truncated = (b"RIFF" + struct.pack("<I", 12) + b"WEBP"
                 + b"VP8 " + struct.pack("<I", 0))
    junk = b"RIFF" + b"\x00" * 16
    df = spark.createDataFrame(pd.DataFrame(
        {"url": ["vp8", "vp8x", "vp8x_vp8l", "trunc", "junk"],
         "html": [_vp8_keyframe_webp(640, 480), _vp8x_webp(1920, 1080),
                  vp8x_wrapped, truncated, junk]}))
    got = {r.url: r for r in mm.extract_media_meta(df).collect()}
    assert (got["vp8"].format, got["vp8"].width, got["vp8"].height) == \
        ("webp-vp8", 640, 480)
    assert got["vp8"].mean_luma is None          # header parse, no pixels
    assert (got["vp8x"].format, got["vp8x"].width, got["vp8x"].height) == \
        ("webp-vp8x", 1920, 1080)
    assert (got["vp8x_vp8l"].format, got["vp8x_vp8l"].width,
            got["vp8x_vp8l"].height) == ("webp", 10, 8)
    assert got["vp8x_vp8l"].mean_luma is not None  # real decode
    assert got["trunc"].format == "error"        # no keyframe header
    # non-WEBP RIFF routes to the audio operator's documented stub
    assert got["junk"].format == "stubbed"


def test_vp8_14bit_dimension_mask():
    """The upscale hint bits above the 14-bit size must be masked out."""
    from tuatara_spark.ops import multimodal as mm
    raw = _vp8_keyframe_webp(0, 0)
    # splice in width 0x3FFF with upscale bits set (0xFFFF)
    frame = (b"\x00\x00\x00" + b"\x9d\x01\x2a"
             + struct.pack("<HH", 0xFFFF, 0xBFFE))
    chunk = b"VP8 " + struct.pack("<I", len(frame)) + frame
    buf = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert mm._webp_lossy_dims(buf) == ("webp-vp8", 0x3FFF, 0x3FFE)
    assert mm._webp_lossy_dims(raw) == ("webp-vp8", 0, 0)


def test_rle_backrefs_compress_runs():
    """The encoder emits distance-1 LZ77 backrefs for pixel runs — a
    mostly-white page must compress by orders of magnitude, and the
    stream decodes through the decoder's REAL backref path."""
    page, _ = fx.render_page("rle", 256, 256, 4)
    buf = WB.encode_webp(page)
    assert len(buf) < page.nbytes // 100
    assert (WB.decode_webp(buf) == page).all()
    # run straddling the _MAX_BACKREF cap still round trips
    img = np.full((70, 70, 3), 9, np.uint8)   # 4900 px > 4096 cap
    assert (WB.decode_webp(WB.encode_webp(img)) == img).all()
    # alternating pixels (no runs at all) stay pure-literal and exact
    img = np.zeros((16, 16, 3), np.uint8)
    img.reshape(-1, 3)[::2] = 255
    assert (WB.decode_webp(WB.encode_webp(img)) == img).all()


def test_predictor_transform_round_trip_all_modes():
    """Encode→decode under every §4.1 predictor mode and several block
    sizes must reproduce the image bit-exactly (forward/inverse twins)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(20, 13, 3)).astype(np.uint8)
    for mode in range(14):
        got = WB.decode_webp(WB.encode_webp(img, predictor=mode,
                                            predictor_bits=3))
        assert (got == img).all(), mode
    imga = rng.integers(0, 256, size=(9, 31, 4)).astype(np.uint8)
    for bits in (2, 4, 6):
        got = WB.decode_webp(WB.encode_webp(imga, predictor=12,
                                            predictor_bits=bits))
        assert (got == imga).all(), bits


def test_predictor_compresses_rendered_page():
    page, _ = fx.render_page("pred", 256, 256, 4)
    plain = WB.encode_webp(page)
    pred = WB.encode_webp(page, predictor=2)   # T-predictor
    assert (WB.decode_webp(pred) == page).all()
    assert len(pred) < len(plain)              # ~2x on document pages


def test_predictor_inverse_hand_computed():
    """Decoder-only pin of the INVERSE predictor, independent of our own
    forward transform: a hand-built 2x2 stream (one mode-12 block) whose
    expected pixels are computed by hand from the spec edge rules —
    (0,0) black-predicted, top row L, left column T, interior
    ClampAddSubtractFull(L, T, TL)."""
    sub = np.array([[0, 12, 0, 255]], np.int64)          # one block, mode 12
    residuals = np.array([[10, 20, 30, 0],               # (0,0) vs black
                          [5, 5, 5, 0],                  # (1,0) vs L
                          [1, 2, 3, 0],                  # (0,1) vs T
                          [4, 3, 2, 0]], np.int64)       # (1,1) vs mode 12
    bw = WB._BitWriter()
    bw.bits(2 - 1, 14)
    bw.bits(2 - 1, 14)
    bw.bits(1, 1)            # alpha present
    bw.bits(0, 3)            # version
    bw.bits(1, 1)            # a transform follows
    bw.bits(0, 2)            # PREDICTOR
    bw.bits(2 - 2, 3)        # size_bits = 2 (4x4 blocks -> one block)
    bw.bits(0, 1)            # sub-image: no color cache
    WB._encode_pixel_stream(bw, sub)
    bw.bits(0, 1)            # no more transforms
    bw.bits(0, 1)            # no color cache
    bw.bits(0, 1)            # no meta codes
    WB._encode_pixel_stream(bw, residuals)
    import struct as _s
    payload = bytes([0x2F]) + bw.done()
    chunk = b"VP8L" + _s.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    buf = b"RIFF" + _s.pack("<I", len(riff)) + riff
    got = WB.decode_webp(buf)
    # hand-derived: (0,0)=(10,20,30,255); (1,0)=L+res=(15,25,35,255);
    # (0,1)=T+res=(11,22,33,255); (1,1): pred=clamp(L+T-TL)=(16,27,38,255)
    # +res=(20,30,40,255)
    want = np.array([[[10, 20, 30, 255], [15, 25, 35, 255]],
                     [[11, 22, 33, 255], [20, 30, 40, 255]]], np.uint8)
    assert (got == want).all()


def test_cross_color_round_trip_and_hand_pin():
    """Spec §4.2 cross-color: encode/decode round trip under several
    delta triples (incl. negative int8 values), composed with the
    predictor — plus a hand-computed single-pixel pin of the signed
    (t·c)»5 arithmetic."""
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, size=(17, 23, 3)).astype(np.uint8)
    for deltas in [(0, 0, 0), (32, 16, 8), (0xF0, 0x80, 0x7F)]:
        got = WB.decode_webp(WB.encode_webp(img, cross_color=deltas))
        assert (got == img).all(), deltas
    got = WB.decode_webp(WB.encode_webp(img, predictor=7,
                                        cross_color=(5, 250, 3)))
    assert (got == img).all()

    # hand pin: one pixel, g2r=64 (=> +int8(green)*64>>5 = green*2 for
    # small greens), g2b=0, r2b=32 (=> +int8(new_red))
    # stored (r,g,b)=(10, 7, 20): red = 10 + (64*7>>5) = 24;
    # blue = 20 + 0 + (32*24>>5) = 44
    sub = np.array([[32, 0, 64, 255]], np.int64)   # r=r2b, g=g2b, b=g2r
    pxl = np.array([[10, 7, 20, 255]], np.int64)
    bw = WB._BitWriter()
    bw.bits(0, 14)
    bw.bits(0, 14)
    bw.bits(1, 1)
    bw.bits(0, 3)
    bw.bits(1, 1)
    bw.bits(1, 2)        # CROSS_COLOR
    bw.bits(0, 3)        # size_bits = 2
    bw.bits(0, 1)
    WB._encode_pixel_stream(bw, sub)
    bw.bits(0, 1)
    bw.bits(0, 1)
    bw.bits(0, 1)
    WB._encode_pixel_stream(bw, pxl)
    payload = bytes([0x2F]) + bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    got = WB.decode_webp(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    assert (got == np.array([[[24, 7, 44, 255]]], np.uint8)).all()


def test_color_indexing_round_trip_all_bundlings():
    """Spec §4.3 color indexing: every bundling regime (2/4/16/256
    colors -> 1/2/4/8-bit indices), odd widths that don't divide the
    bundle, alpha palettes, and the differential palette coding."""
    rng = np.random.default_rng(22)
    for n_colors, shape in [(2, (5, 13, 3)), (4, (7, 9, 3)),
                            (13, (6, 21, 3)), (200, (16, 16, 3))]:
        pal = rng.integers(0, 256, size=(n_colors, 3)).astype(np.uint8)
        idx = rng.integers(0, n_colors, size=shape[:2])
        img = pal[idx]
        got = WB.decode_webp(WB.encode_webp(img, palette=True))
        assert (got == img).all(), n_colors
    # alpha-carrying palette
    pal = np.array([[1, 2, 3, 4], [200, 100, 50, 255]], np.uint8)
    img = pal[rng.integers(0, 2, size=(4, 19))]
    got = WB.decode_webp(WB.encode_webp(img, palette=True))
    assert (got == img).all()


def test_fuzz_transformed_streams_never_silent():
    """Corruption fuzz over TRANSFORMED streams (predictor+cross-color
    and palette): truncation/bit-flips must error or decode to SOME
    image, never crash or hang."""
    rng = np.random.default_rng(33)
    img = rng.integers(0, 256, size=(16, 11, 3)).astype(np.uint8)
    pal_img = np.array([[10, 20, 30], [200, 210, 220]],
                       np.uint8)[rng.integers(0, 2, size=(9, 14))]
    for buf in (WB.encode_webp(img, predictor=12, cross_color=(9, 8, 7)),
                WB.encode_webp(pal_img, palette=True)):
        for cut in range(0, len(buf), max(1, len(buf) // 13)):
            try:
                WB.decode_webp(buf[:cut])
            except ValueError:
                pass
        for pos in range(12, len(buf), max(1, len(buf) // 23)):
            m = bytearray(buf)
            m[pos] ^= 0xFF
            try:
                out = WB.decode_webp(bytes(m))
                assert out.dtype == np.uint8
            except (ValueError, KeyError):
                pass


def _green_code(literal, length_sym):
    """Full green prefix code giving 1-bit codes to exactly {literal,
    length_sym} (canonical: the lower symbol gets code 0)."""
    bits = [(0, 1)]                      # full (non-simple) form
    bits += [(19 - 4, 4)]
    cl_lens = {0: 1, 1: 1}
    for s in WB._CL_ORDER:
        bits += [(cl_lens.get(s, 0), 3)]
    bits += [(1, 1), (4, 3), (length_sym + 1 - 2, 10)]
    for sym in range(length_sym + 1):
        bits += [(1, 1) if sym in (literal, length_sym) else (0, 1)]
    return bits


def test_2d_distance_table_derivation():
    # the derived table must reproduce the spec's listed ordering: pinned
    # here against hand-checked rows of the published table
    t = WB._DIST_TABLE
    assert len(t) == 120 and len(set(t)) == 120
    assert t[:16] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
                      (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
                      (0, 3), (3, 0), (1, 3), (-1, 3)]
    assert t[34:40] == [(0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0)]
    assert t[119] == (8, 7)
    # mapping is width-dependent and clamped to >= 1
    assert WB._plane_code_to_distance(3, 2) == 1     # (1, 0)
    assert WB._plane_code_to_distance(3, 1) == 3     # (0, 1): one row up
    assert WB._plane_code_to_distance(3, 10) == 1    # (-2, 1): 3 - 2
    assert WB._plane_code_to_distance(1, 4) == 1     # (-1, 1): 0 -> clamp
    assert WB._plane_code_to_distance(5, 121) == 1   # linear unchanged


def test_decoder_2d_dist1_same_row():
    # same pixels as the linear-distance test, but the backref uses 2D
    # close-neighbor code 2 = (1, 0) = previous pixel
    bits = [(1, 1), (2, 2), (0, 1), (0, 1), (0, 1)]
    bits += _green_code(literal=5, length_sym=257)
    bits += _simple_code(200) + _simple_code(100) + _simple_code(255)
    bits += _simple_code(1)   # distance sym 1 -> value 2 -> (1,0) -> d=1
    bits += [(0, 1)]          # green literal 5
    bits += [(1, 1)]          # sym 257 -> length 2
    out = WB.decode_webp(_raw_stream(3, 1, bits))
    assert (out == np.array([[[205, 5, 105]] * 3])).all()


def test_decoder_2d_row_copy_backref():
    # 3x2: three literals, then a length-3 backref with 2D distance
    # code 1 = (0, 1) = exactly one row up (distance = image width)
    bits = [(1, 1), (2, 2), (0, 1), (0, 1), (0, 1)]
    bits += _green_code(literal=5, length_sym=258)
    bits += _simple_code(200) + _simple_code(100) + _simple_code(255)
    bits += _simple_code(0)   # distance sym 0 -> value 1 -> (0,1)
    bits += [(0, 1)] * 3      # three green-5 literals (row 0)
    bits += [(1, 1)]          # sym 258 -> length 3 (row 1 = row 0)
    out = WB.decode_webp(_raw_stream(3, 2, bits))
    assert out.shape == (2, 3, 3)
    assert (out == np.array([[[205, 5, 105]] * 3] * 2)).all()


def test_decoder_meta_prefix_groups():
    # 8x1, meta blocks of 4 px (prefix_bits = 2): the 2x1 entropy image
    # assigns block 0 -> group 0, block 1 -> group 1; each group's codes
    # are all single-symbol so the 8 ARGB pixels consume zero data bits
    # and differ ONLY through group selection.
    bits = [(0, 1)]            # no transforms
    bits += [(0, 1)]           # no color cache (main image)
    bits += [(1, 1), (0, 3)]   # meta prefix present, prefix_bits = 0+2
    # -- entropy image (2x1), itself an entropy-coded image --
    bits += [(0, 1)]           # entropy image: no color cache
    bits += [(1, 1), (1, 1), (1, 1), (0, 8), (1, 8)]  # green: {0, 1}
    bits += _simple_code(0)    # red (group index high byte = 0)
    bits += _simple_code(0)    # blue
    bits += _simple_code(0)    # alpha
    bits += _simple_code(0)    # distance
    bits += [(0, 1), (1, 1)]   # entropy pixels: green 0 then green 1
    # -- group 0 codes (all single-symbol: zero bits per pixel) --
    bits += _simple_code(10)   # green
    bits += _simple_code(11)   # red
    bits += _simple_code(12)   # blue
    bits += _simple_code(255)  # alpha
    bits += _simple_code(0)    # distance
    # -- group 1 codes --
    bits += _simple_code(20)
    bits += _simple_code(21)
    bits += _simple_code(22)
    bits += _simple_code(255)
    bits += _simple_code(0)
    out = WB.decode_webp(_raw_stream(8, 1, bits))
    assert out.shape == (1, 8, 3)
    assert (out == np.array([[[11, 10, 12]] * 4 + [[21, 20, 22]] * 4])).all()
