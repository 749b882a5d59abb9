"""IVF ANN, video frame sampling, odd-size-page robustness."""

import numpy as np
import pandas as pd
import pytest

from tuatara_spark import fixtures as fx
from tuatara_spark.ops import multimodal, similarity
from tuatara_spark.ref import pipeline as pl


def test_ivf_topk_finds_near_neighbor(spark):
    rng = np.random.default_rng(5)
    # clustered data so IVF cells are meaningful
    centers = rng.standard_normal((4, 16)) * 4
    vecs = np.concatenate([
        centers[i] + rng.standard_normal((100, 16)) * 0.5 for i in range(4)
    ]).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(400),
                        "embedding": [v.tolist() for v in vecs],
                        "label": 0})
    df = spark.createDataFrame(pdf)
    cent = similarity.ivf_centroids(df, n_centroids=4, sample=400)
    assert cent.shape == (4, 16)
    q = vecs[42].astype(np.float64)
    got = [r.vec_id for r in
           similarity.ivf_topk(df, q, cent, k=5, n_probe=1).collect()]
    assert got and got[0] == 42
    # determinism
    cent2 = similarity.ivf_centroids(df, n_centroids=4, sample=400)
    assert (cent == cent2).all()


def test_ivf_cell_assignment_covers_all(spark):
    rng = np.random.default_rng(6)
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    df = spark.createDataFrame(pd.DataFrame(
        {"vec_id": range(50), "embedding": [v.tolist() for v in vecs]}))
    cent = similarity.ivf_centroids(df, n_centroids=3, sample=50)
    cells = [r.ivf_cell for r in
             similarity.with_ivf_cell(df, cent).collect()]
    assert all(0 <= c < 3 for c in cells)


def test_frame_sample(spark, weights):
    f1, _ = fx.render_page("a", 128, 128, 4)
    f2, _ = fx.render_page("c", 128, 128, 4)
    f3, _ = fx.render_page("e", 128, 128, 4)
    video = multimodal.encode_tpgv([f1, f2, f3])
    df = spark.createDataFrame(pd.DataFrame(
        [{"url": "v1", "html": video},
         {"url": "bad", "html": b"NOTVIDEO"}]))
    rows = multimodal.frame_sample(df, every_k=2).collect()
    got = {(r.url, r.frame_idx) for r in rows}
    assert got == {("v1", 0), ("v1", 2)}  # every 2nd frame; bad skipped
    # sampled frames decode back to the original rasters
    by_idx = {r.frame_idx: r for r in rows}
    assert (fx.decode_tpage(bytes(by_idx[0].frame)) == f1).all()
    assert (fx.decode_tpage(bytes(by_idx[2].frame)) == f3).all()


def test_odd_size_page_extraction(weights):
    # 200x296 page: not square, not a multiple of 32 → pad-to-32 path
    img, lines = fx.render_page("OddSize", 200, 296, 4)
    r = pl.extract_page(img, weights)
    assert r["text"] == "\n".join(lines)


def test_tall_narrow_page(weights):
    img, lines = fx.render_page("ab", 512, 160, 4)
    r = pl.extract_page(img, weights)
    assert r["text"] == "\n".join(lines)
