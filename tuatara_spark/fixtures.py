"""Deterministic fixture synthesis: TPAGE-encoded web-page rasters.

Plays the role of the reference's ``images/*.png`` fixtures (not decodable
here — no image codec in the sandbox). All geometry is defined in glyph-bit
units scaled by ``s`` px/bit, so a page rendered at s=8 downscales
bit-exactly to its s=4 twin under the pipeline's half-pixel-center bilinear
resize (used by the 2048px skew pages, which hit the canvas_size=1024 cap,
tuatara.cpp:352).

Every page carries a calibration mark (solid CAL_BITS block) at a fixed
margin position: its text/link detection response equals the full kernel
sum — the provable maximum of a normalized kernel over [0,1] ink — so the
global min-max normalization of the score maps (tuatara.cpp:120-121) is the
same float32 constant on every page. See tuatara_spark.font docstring.

``html`` payload format (TPAGE v1, FIXTURES.md §1):
  b"TPG1" + uint16_le height + uint16_le width + raw RGB uint8 (H*W*3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tuatara_spark import charset as cs
from tuatara_spark import font as ft

# --- layout, in glyph-bit units (px = bits * s) ---
CAL_BITS_H, CAL_BITS_W = 3, 4   # calibration mark block
CAL_OFF_BITS = 1                # mark origin (px = s, s)
MARGIN_BITS = 11                # text origin margin
ADV_X_BITS = 11                 # glyph advance (5-bit glyph + 6-bit gap)
ADV_Y_BITS = 13                 # line advance (7-bit glyph + 6-bit gap)

INK = np.uint8(0)
PAPER = np.uint8(255)

# Fixture ground-truth text avoids only ']' (its class id 88 is removed by
# the decode filter, quirk Q1 — exercised by a dedicated test instead).
ALLOWED_CHARS = cs.CHARSET.replace("]", "")
# rng.choice needs unique symbols; drop the duplicate '\'
_ALLOWED_UNIQUE = sorted(set(ALLOWED_CHARS))

TPAGE_MAGIC = b"TPG1"
TPBIT_MAGIC = b"TPB1"

EPOCH = np.datetime64("2026-01-01T00:00:00", "us")

LANGS = ["en", "de", "fr", "es", "pt", "unk"]


def page_capacity(h_px: int, w_px: int, s: int) -> tuple[int, int]:
    """(cols, rows) of glyph cells that fit on the page."""
    hb, wb = h_px // s, w_px // s
    cols = (wb - 2 * MARGIN_BITS - ft.GLYPH_COLS) // ADV_X_BITS + 1
    rows = (hb - 2 * MARGIN_BITS - ft.GLYPH_ROWS) // ADV_Y_BITS + 1
    return max(cols, 0), max(rows, 0)


def render_page(text: str, h: int = 256, w: int = 256, s: int = 4,
                font: np.ndarray | None = None,
                with_mark: bool = True) -> tuple[np.ndarray, list[str]]:
    """Render ``text`` onto an (h, w, 3) uint8 RGB page. Returns
    (image, lines) where lines is the row-major line split (the ground
    truth the extractor should reproduce, joined with '\\n')."""
    if font is None:
        font = ft.build_font()
    if h % (2 * s) or w % (2 * s):
        raise ValueError("page dims must be multiples of 2*s")
    cols, rows = page_capacity(h, w, s)
    if len(text) > cols * rows:
        raise ValueError(f"text too long: {len(text)} > {cols * rows}")
    img = np.full((h, w), PAPER, dtype=np.uint8)
    if with_mark:
        y0, x0 = CAL_OFF_BITS * s, CAL_OFF_BITS * s
        img[y0:y0 + CAL_BITS_H * s, x0:x0 + CAL_BITS_W * s] = INK
    lines = [text[i:i + cols] for i in range(0, len(text), cols)] if text else []
    for r, line in enumerate(lines):
        oy = (MARGIN_BITS + r * ADV_Y_BITS) * s
        for c, ch in enumerate(line):
            ox = (MARGIN_BITS + c * ADV_X_BITS) * s
            mask = ft.render_glyph_mask(ft.glyph_for_char(font, ch), s)
            cell = img[oy:oy + mask.shape[0], ox:ox + mask.shape[1]]
            cell[mask] = INK
    return np.repeat(img[:, :, None], 3, axis=2), lines


def encode_tpage(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return (TPAGE_MAGIC + int(h).to_bytes(2, "little")
            + int(w).to_bytes(2, "little") + img.tobytes())


def decode_tpage(buf: bytes) -> np.ndarray:
    if buf[:4] != TPAGE_MAGIC:
        raise ValueError("not a TPAGE payload")
    h = int.from_bytes(buf[4:6], "little")
    w = int.from_bytes(buf[6:8], "little")
    arr = np.frombuffer(buf, dtype=np.uint8, offset=8, count=h * w * 3)
    return arr.reshape(h, w, 3)


def encode_tpbit(img: np.ndarray, threshold: int | None = None) -> bytes:
    """TPBIT v1: 1 bit/px packed ink plane (bit=1 → ink 0, bit=0 → paper
    255), ``b"TPB1" + uint16_le h + uint16_le w + packbits(ink)``.

    24× smaller than TPG1 raw RGB — rendered pages are binary ink, so for
    them the round trip is byte-identical to the original RGB raster. This
    is the production wire format: payload bytes dominate the scan /
    shuffle / JVM→Python Arrow transfer, all of which shrink 24×.

    TPBIT is 1-bit: non-binary input (grayscale, PNG-decoded photos) can
    only be encoded LOSSILY. That must be an explicit choice, not a silent
    default — with ``threshold=None`` a plane containing values other than
    {0, 255} raises; pass ``threshold`` to opt into binarization
    (``plane < threshold`` → ink)."""
    plane = img[..., 0] if img.ndim == 3 else img
    h, w = plane.shape
    if threshold is None:
        if not bool(((plane == 0) | (plane == 255)).all()):
            raise ValueError(
                "TPBIT input is not binary {0,255}; encoding would be "
                "lossy — pass encode_tpbit(img, threshold=...) to opt in")
        threshold = 128
    bits = np.packbits((plane < threshold).reshape(-1))
    return (TPBIT_MAGIC + int(h).to_bytes(2, "little")
            + int(w).to_bytes(2, "little") + bits.tobytes())


def decode_tpbit(buf: bytes) -> np.ndarray:
    """TPBIT → (H, W, 3) uint8 RGB.

    Contract: the result is READ-ONLY (the channel axis is a stride-0
    ``broadcast_to`` view — widening materializes h*w bytes, not h*w*3;
    ``decode_tpage``'s frombuffer view is equally read-only). The pipeline
    only reads pages; mutation sites (e.g. drawing overlays) must copy
    first — viz.py already does."""
    if buf[:4] != TPBIT_MAGIC:
        raise ValueError("not a TPBIT payload")
    h = int.from_bytes(buf[4:6], "little")
    w = int.from_bytes(buf[6:8], "little")
    packed = np.frombuffer(buf, dtype=np.uint8, offset=8,
                           count=(h * w + 7) // 8)
    # bit=1 → INK(0), bit=0 → PAPER(255); channel axis is a stride-0
    # broadcast view (read-only, like decode_tpage's frombuffer) so the
    # widening writes h*w bytes, not h*w*3 — the pipeline only reads pages
    plane = ((np.unpackbits(packed, count=h * w) ^ 1)
             * np.uint8(255)).reshape(h, w)
    return np.broadcast_to(plane[:, :, None], (h, w, 3))


def decode_payload(buf: bytes) -> np.ndarray:
    """Decode any supported page payload to an (H, W, 3) uint8 RGB array,
    dispatching on the magic (TPAGE/TPBIT rasters, real PNG — the
    reference's own fixture format, examples/resume.cpp:9 — real JPEG
    baseline/progressive, or real GIF). The returned array may be a READ-ONLY view (TPAGE: frombuffer;
    TPBIT: stride-0 broadcast) — copy before mutating."""
    magic = bytes(buf[:4])
    if magic == TPAGE_MAGIC:
        return decode_tpage(buf)
    if magic == TPBIT_MAGIC:
        return decode_tpbit(buf)
    if magic == b"\x89PNG":
        from tuatara_spark.ref.png import decode_png
        return decode_png(buf)
    if magic[:3] == b"\xff\xd8\xff":
        from tuatara_spark.ref.jpeg import decode_jpeg
        return decode_jpeg(buf)
    if magic == b"GIF8":
        from tuatara_spark.ref.gif import decode_gif
        return decode_gif(buf)
    if magic == b"RIFF" and bytes(buf[8:12]) == b"WEBP":
        from tuatara_spark.ref.webp import decode_webp
        img = decode_webp(bytes(buf))
        return img[..., :3] if img.shape[2] == 4 else img
    if magic[:2] == b"BM":
        from tuatara_spark.ref.bmp import decode_bmp
        return decode_bmp(buf)
    if magic in (b"II*\x00", b"MM\x00*"):
        from tuatara_spark.ref.tiff import decode_tiff
        return decode_tiff(buf)
    raise ValueError(f"unknown page payload magic {magic!r}")


def pages_to_parquet(df: pd.DataFrame, path: str) -> None:
    """Write a pages table to parquet with µs timestamps (pandas defaults
    to ns, which Spark's parquet reader rejects: PARQUET_TYPE_ILLEGAL)."""
    import pyarrow.parquet as pq
    import pyarrow as pa_
    tbl = pa_.Table.from_pandas(df, preserve_index=False)
    pq.write_table(tbl, path, coerce_timestamps="us",
                   allow_truncated_timestamps=True)


def _make_url(rng: np.random.Generator, i: int) -> str:
    # Zipf-ish host distribution so url-hash salting is exercised
    host = min(int(rng.zipf(2.0)), 40)
    return f"https://example{host}.test/p{i // 100}/{i:06d}"


def make_pages(n: int, seed: int = 42, h: int = 256, w: int = 256,
               s: int = 4, n_large: int = 0, large_dim: int = 2048,
               font: np.ndarray | None = None,
               payload: str = "tpage") -> pd.DataFrame:
    """Deterministic pages table (url, warc_ts, html, text, lang).

    ``n`` small pages at (h, w) with glyph scale ``s``; ``n_large`` extra
    skew pages at (large_dim, large_dim) with scale 2*s (≈ (large_dim/h)²×
    the per-page cost — the 'skewed large pages' of the north_rule).
    ``text`` is the rendered ground truth ('\\n' between lines)."""
    if font is None:
        font = ft.build_font()
    encode = {"tpage": encode_tpage, "tpbit": encode_tpbit}[payload]
    rng = np.random.default_rng(seed)
    rows = []
    specs = [(h, w, s)] * n + [(large_dim, large_dim, 2 * s)] * n_large
    for i, (ph, pw, ps) in enumerate(specs):
        cols, prow = page_capacity(ph, pw, ps)
        cap = min(cols * prow, 40)
        length = int(rng.integers(1, cap + 1))
        chars = rng.choice(_ALLOWED_UNIQUE, size=length)
        text = "".join(chars)
        img, lines = render_page(text, ph, pw, ps, font=font)
        rows.append({
            "url": _make_url(rng, i),
            "warc_ts": EPOCH + np.timedelta64(int(rng.integers(0, 10_000_000)), "s"),
            "html": encode(img),
            "text": "\n".join(lines),
            "lang": LANGS[int(rng.integers(0, len(LANGS)))],
        })
    df = pd.DataFrame(rows)
    df["warc_ts"] = df["warc_ts"].astype("datetime64[us]")
    return df
