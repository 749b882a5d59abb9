"""Adversarial-input equivalence: on arbitrary noise images (blobs with
rotated/irregular shapes the glyph fixtures never produce) the Spark engine
must still match the oracle byte-for-byte, and nothing may crash."""

import numpy as np
import pandas as pd
import pytest

from tuatara_spark import engine, fixtures as fx
from tuatara_spark.ref import pipeline as pl


def _noise_page(seed: int, h: int = 128, w: int = 128) -> np.ndarray:
    """Smoothed thresholded noise → irregular ink blobs (non-axis-aligned
    components exercise the rotating-calipers path)."""
    rng = np.random.default_rng(seed)
    field = rng.random((h // 8, w // 8))
    big = np.repeat(np.repeat(field, 8, axis=0), 8, axis=1)
    img = np.where(big > 0.75, 0, 255).astype(np.uint8)
    return np.repeat(img[:, :, None], 3, axis=2)


@pytest.fixture(scope="module")
def noise_pages():
    rows = []
    for i in range(24):
        img = _noise_page(seed=1000 + i)
        rows.append({"url": f"https://noise.test/{i:04d}",
                     "warc_ts": fx.EPOCH, "html": fx.encode_tpage(img),
                     "text": "", "lang": "unk"})
    df = pd.DataFrame(rows)
    df["warc_ts"] = df["warc_ts"].astype("datetime64[us]")
    return df


def test_noise_pages_spark_matches_oracle(spark, weights, noise_pages):
    got = {r.url: r for r in
           engine.extract_df(spark.createDataFrame(noise_pages),
                             weights=weights).collect()}
    any_spans = False
    for _, row in noise_pages.iterrows():
        oracle = pl.extract_page(fx.decode_tpage(row["html"]), weights)
        r = got[row["url"]]
        assert r.error is None
        assert r.text == oracle["text"]
        assert len(r.spans) == len(oracle["spans"])
        for a, b in zip(r.spans, oracle["spans"]):
            assert a.text == b["text"]
            assert a.bbox == [float(v) for v in b["bbox"]]
        any_spans = any_spans or bool(oracle["spans"])
    assert any_spans  # the noise actually produced detections


def test_all_black_and_gradient_pages(spark, weights):
    black = np.zeros((128, 128, 3), np.uint8)
    grad = np.tile(np.arange(128, dtype=np.uint8)[None, :, None], (128, 1, 3))
    rows = [{"url": "b", "html": fx.encode_tpage(black)},
            {"url": "g", "html": fx.encode_tpage(grad)}]
    df = pd.DataFrame(rows)
    got = {r.url: r for r in
           engine.extract_df(spark.createDataFrame(df),
                             weights=weights).collect()}
    for u in ("b", "g"):
        assert got[u].error is None
        img = fx.decode_tpage(dict(zip(df["url"], df["html"]))[u])
        oracle = pl.extract_page(img, weights)
        assert got[u].text == oracle["text"]
