"""Frozen-golden pinning: the kernel must reproduce the COMMITTED golden
file byte-for-byte. Oracle and engine share one code path, so without this
file a refactor could shift both together silently; any arithmetic change
must consciously regenerate fixtures/golden_r1.json (tools/gen_goldens.py)."""

import json
import os

import pytest

from tuatara_spark import engine, fixtures as fx
from tuatara_spark.ref import pipeline as pl

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures", "golden_r1.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def pages():
    return fx.make_pages(24, seed=1234, n_large=1)


def test_oracle_reproduces_frozen_golden(weights, golden, pages):
    assert len(golden) == len(pages)
    for _, row in pages.iterrows():
        want = golden[row["url"]]
        r = pl.extract_page(fx.decode_tpage(row["html"]), weights)
        assert r["text"] == want["text"], row["url"]
        assert r["text"] == want["truth"]  # and truth still matches
        assert len(r["spans"]) == len(want["spans"])
        for got, exp in zip(r["spans"], want["spans"]):
            assert got["text"] == exp["text"]
            assert [float(v) for v in got["bbox"]] == exp["bbox"]


def test_spark_reproduces_frozen_golden(spark, weights, golden, pages):
    rows = {r.url: r for r in
            engine.extract_df(spark.createDataFrame(pages),
                              weights=weights).collect()}
    for url, want in golden.items():
        got = rows[url]
        assert got.text == want["text"], url
        assert [[s.text, s.bbox] for s in got.spans] == \
            [[s["text"], s["bbox"]] for s in want["spans"]]
