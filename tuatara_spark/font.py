"""Deterministic synthetic glyph font for fixture pages and templates.

The reference's own fixtures are six PNG photos (reference images/) that
cannot be decoded here (no image codec in the sandbox), so fixture pages are
synthesized from this font (FIXTURES.md §1). Glyphs are 5x7 bitmaps, one per
charset character, rendered as s×s ink blocks on white pages.

Design (load-bearing for byte-identical extraction):

1. **Fixed border ring + anchor block.** Every glyph has its full 1-bit
   border and a 2x2 interior anchor ON. The ring fixes the component's
   outer thresholded extent independent of the free bits; the anchor
   guarantees a dense region whose text response clears the reference's
   per-component peak filter (text_threshold=0.7, tuatara.cpp:154).
2. **Calibration mark** (see fixtures.CAL_BITS): every fixture page AND
   every template tile carries a solid ink block large enough to saturate
   both detection kernels, so the page-global max used by score-map
   normalization (tuatara.cpp:120-121) is the same float32 constant on
   every page. That makes each glyph's thresholded component — hence its
   dilation radius, crop, and template correlation — a purely local,
   page-independent function, which is what pins recognition to corr==1.0
   against the glyph's own template.
3. **Pairwise Hamming distance ≥ 3** over the 11 free interior bits, so
   template correlations are well-separated and greedy argmax is stable.

The font is a pure function of the seed; nothing is learned.
"""

from __future__ import annotations

import numpy as np

from tuatara_spark import charset as cs

GLYPH_ROWS, GLYPH_COLS = 7, 5

# bit layout
RING = {(r, c) for r in (0, GLYPH_ROWS - 1) for c in range(GLYPH_COLS)} | \
       {(r, c) for r in range(GLYPH_ROWS) for c in (0, GLYPH_COLS - 1)}
ANCHOR = {(2, 1), (2, 2), (3, 1), (3, 2)}
FREE = sorted({(r, c) for r in range(1, 6) for c in range(1, 4)} - ANCHOR)
assert len(FREE) == 11

_FONT_CACHE: dict[int, np.ndarray] = {}


def bitmap_from_pattern(pattern: int) -> np.ndarray:
    """(7, 5) bool bitmap for an 11-bit free-bit pattern."""
    bm = np.zeros((GLYPH_ROWS, GLYPH_COLS), dtype=bool)
    for r, c in RING | ANCHOR:
        bm[r, c] = True
    for i, (r, c) in enumerate(FREE):
        if (pattern >> i) & 1:
            bm[r, c] = True
    return bm


def render_glyph_mask(bitmap: np.ndarray, s: int) -> np.ndarray:
    """Upscale a (7, 5) bool bitmap to (7s, 5s) bool ink mask."""
    return np.repeat(np.repeat(bitmap, s, axis=0), s, axis=1)


def build_font(seed: int = 42) -> np.ndarray:
    """(95, 7, 5) bool — one bitmap per charset position. Duplicate charset
    characters (the two ``\\`` positions) share one bitmap. Deterministic:
    greedy Hamming-≥3 code selection over seeded-shuffled free-bit patterns.
    Pattern 0 (skeleton) is excluded so no glyph is pure ring+anchor."""
    if seed in _FONT_CACHE:
        return _FONT_CACHE[seed]
    # Lexicographic greedy yields a 128-word distance-3 code over 11 bits
    # (shortened-Hamming structure); seeded assignment of words to chars.
    code: list[int] = []
    for p in range(1, 2048):
        if all(bin(p ^ q).count("1") >= 3 for q in code):
            code.append(p)
    rng = np.random.default_rng(seed)
    # 94 unique charset chars (charset has '\' twice)
    chosen = [code[i] for i in rng.permutation(len(code))[:94]]
    char_to_bm: dict[str, np.ndarray] = {}
    it = iter(chosen)
    for ch in cs.CHARSET:
        if ch not in char_to_bm:
            char_to_bm[ch] = bitmap_from_pattern(next(it))
    font = np.stack([char_to_bm[ch] for ch in cs.CHARSET])
    _FONT_CACHE[seed] = font
    return font


def glyph_for_char(font: np.ndarray, ch: str) -> np.ndarray:
    return font[cs.CHARSET.index(ch)]
