"""Pure-Python GIF codec (ref/gif.py): LZW round trips, interlace,
palette sizes, animation frames, dispatch, and garbage robustness."""

import numpy as np
import pandas as pd
import pytest

from tuatara_spark import fixtures as fx
from tuatara_spark.ops import multimodal
from tuatara_spark.ref import gif as G


@pytest.mark.parametrize("n_colors", [2, 5, 16, 256])
@pytest.mark.parametrize("interlace", [False, True])
def test_round_trip_palette_sizes(n_colors, interlace):
    rng = np.random.default_rng(8)
    colors = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    img = colors[rng.integers(0, n_colors, (37, 53))]
    out = G.decode_gif(G.encode_gif(img, interlace=interlace))
    assert (out == img).all()


def test_rendered_page_round_trip_and_extraction(weights):
    """A binary page through an interlaced GIF (exercises the LZW
    table-reset path at 64k pixels) extracts byte-identically."""
    from tuatara_spark.ref import pipeline as pl
    img, lines = fx.render_page("Gg", 256, 256, 4)
    out = G.decode_gif(G.encode_gif(img, interlace=True))
    assert (out == img).all()
    assert pl.extract_page(out, weights)["text"] == "\n".join(lines)


def test_animation_frames_composite():
    """Multi-frame GIF: later frames composite on the logical screen
    (do-not-dispose), transparency leaves the underlay visible."""
    base = np.zeros((8, 8, 3), dtype=np.uint8)
    base[:, :, 0] = 200                       # red-ish frame 1
    buf = bytearray(G.encode_gif(base))
    # append a second 4×4 frame at offset (2,2): palette {blue}, no GCE
    import struct
    blue = np.zeros((4, 4, 3), dtype=np.uint8)
    blue[:, :, 2] = 99
    frame2 = bytearray()
    frame2 += struct.pack("<BHHHHB", 0x2C, 2, 2, 4, 4, 0x80)  # local table
    frame2 += bytes([0, 0, 99] * 2)          # 2-entry local palette
    idx = bytes(16)                          # all color 0 (the blue)
    lzw = G._lzw_encode(idx, 2)
    frame2.append(2)
    frame2.append(len(lzw))
    frame2 += lzw
    frame2.append(0)
    assert buf[-1] == 0x3B
    buf = buf[:-1] + frame2 + b"\x3b"
    frames = G.decode_gif_frames(bytes(buf))
    assert len(frames) == 2
    assert (frames[0] == base).all()
    assert (frames[1][2:6, 2:6] == [0, 0, 99]).all()
    assert (frames[1][0, 0] == [200, 0, 0]).all()   # composite kept


def test_decode_payload_and_media_meta_dispatch(spark):
    img, _ = fx.render_page("a", 128, 128, 4)
    buf = G.encode_gif(img)
    assert (np.asarray(fx.decode_payload(buf)) == img).all()
    df = spark.createDataFrame(pd.DataFrame(
        [{"url": "g", "html": buf},
         {"url": "bad", "html": b"GIF89a" + b"\x01" * 6}]))
    meta = {r.url: r for r in multimodal.extract_media_meta(df).collect()}
    assert meta["g"].format == "gif" and meta["g"].width == 128
    assert meta["bad"].format == "error"


def test_garbage_never_hangs():
    rng = np.random.default_rng(13)
    img = np.repeat(rng.integers(0, 4, (16, 16), dtype=np.uint8) * 80,
                    3).reshape(16, 16, 3)
    buf = bytearray(G.encode_gif(img))
    for _ in range(60):
        mutated = bytearray(buf)
        for _ in range(int(rng.integers(1, 5))):
            mutated[int(rng.integers(6, len(buf)))] = int(rng.integers(256))
        try:
            out = G.decode_gif(bytes(mutated))
            assert out.dtype == np.uint8
        except Exception:
            pass
    for cut in (4, 13, len(buf) // 2, len(buf) - 2):
        try:
            G.decode_gif(bytes(buf[:cut]))
        except Exception:
            pass


def test_too_many_colors_rejected():
    rng = np.random.default_rng(14)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="256"):
        G.encode_gif(img)
