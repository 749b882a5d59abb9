"""Deterministic model-weight construction + broadcast helpers.

The reference loads two TorchScript weight files per call
(tuatara.cpp:333, 423 — reloaded per image, a de-optimization). Real
weights are unavailable offline (reference setup.sh downloads them), so
``build_weights`` constructs the deterministic stand-in parameters
(SURVEY.md §0.2): detection kernels + a recognition template bank built by
running each charset glyph through the REAL detection→crop→resize path on a
calibration tile. A crop of glyph g on any fixture page is then
pixel-identical to the template source (see tuatara_spark.font docstring),
so the correct class wins argmax with correlation exactly 1.0.

At job level the weights dict is broadcast once per job
(``sc.broadcast``) and rehydrated once per Python worker
(tuatara_spark.engine) — the north_star's "model weights broadcast to
executors", replacing the reference's per-call reload.
"""

from __future__ import annotations

import numpy as np

from tuatara_spark import charset as cs
from tuatara_spark import fixtures as fx
from tuatara_spark import font as ft
from tuatara_spark.ref import model as md
from tuatara_spark.ref import pipeline as pl

GAIN = np.float32(8.0)
EOS_BIAS = np.float32(0.6)

_WEIGHTS_CACHE: dict[int, dict] = {}


def _template_tile(ch: str, font: np.ndarray, s: int = 4) -> np.ndarray:
    """96x96 RGB tile: calibration mark + one glyph at the text margin."""
    img = np.full((96, 96), fx.PAPER, dtype=np.uint8)
    y0 = x0 = fx.CAL_OFF_BITS * s
    img[y0:y0 + fx.CAL_BITS_H * s, x0:x0 + fx.CAL_BITS_W * s] = fx.INK
    oy = ox = fx.MARGIN_BITS * s
    mask = ft.render_glyph_mask(ft.glyph_for_char(font, ch), s)
    cell = img[oy:oy + mask.shape[0], ox:ox + mask.shape[1]]
    cell[mask] = fx.INK
    return np.repeat(img[:, :, None], 3, axis=2)


def build_templates(det_params: dict, font: np.ndarray) -> np.ndarray:
    """(95, 32*128) float32 — one normalized ink-feature row per charset
    position, built through the real detection+crop path. Duplicate charset
    chars ('\\' twice) produce identical rows; argmax resolves to the first,
    consistent with the tokenizer's forward-built stoi (quirk Q1)."""
    rows = []
    for ch in cs.CHARSET:
        tile = _template_tile(ch, font)
        boxes, swapped = pl.detect_page(tile, det_params)
        if len(boxes) != 2:
            raise RuntimeError(
                f"template tile for {ch!r}: expected mark+glyph, got {len(boxes)} boxes")
        # label order is raster order of first pixel: mark (top-left) first
        crop = pl.crop_regions(swapped, boxes[1:])[0]
        ink = pl.crops_to_ink([crop], det_params)
        rows.append(md.features_from_ink(ink)[0])
    return np.stack(rows).astype(np.float32)


def build_eos_template(det_params: dict) -> np.ndarray:
    """Reject/EOS prototype: the calibration mark's own crop feature, built
    through the same detection+crop path (mark-only tile)."""
    img = np.full((96, 96), fx.PAPER, dtype=np.uint8)
    y0 = x0 = fx.CAL_OFF_BITS * 4
    img[y0:y0 + fx.CAL_BITS_H * 4, x0:x0 + fx.CAL_BITS_W * 4] = fx.INK
    tile = np.repeat(img[:, :, None], 3, axis=2)
    boxes, swapped = pl.detect_page(tile, det_params)
    if len(boxes) != 1:
        raise RuntimeError(f"mark tile: expected 1 box, got {len(boxes)}")
    crop = pl.crop_regions(swapped, boxes)[0]
    return md.features_from_ink(pl.crops_to_ink([crop], det_params))[0]


def build_weights(seed: int = 42) -> dict:
    """Full deterministic weights blob (NumPy arrays + scalars; picklable
    for sc.broadcast)."""
    if seed in _WEIGHTS_CACHE:
        return _WEIGHTS_CACHE[seed]
    det = md.build_det_params()
    font = ft.build_font(seed)
    w = dict(det)
    w["templates"] = build_templates(det, font)
    w["eos_template"] = build_eos_template(det)
    w["gain"] = GAIN
    w["eos_bias"] = EOS_BIAS
    w["seq_len"] = md.SEQ_LEN
    w["seed"] = seed
    _WEIGHTS_CACHE[seed] = w
    return w
