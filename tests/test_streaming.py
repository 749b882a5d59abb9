"""Structured Streaming ingestion: incremental extraction with Spark
checkpointing (exactly-once per file; availableNow drain)."""

import os
import time

from tuatara_spark import fixtures as fx, streaming as st


def _wait_done(query, timeout=120):
    query.awaitTermination(timeout)


def test_stream_extracts_incrementally(spark, weights, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)

    first = fx.make_pages(8, seed=31)
    fx.pages_to_parquet(first, os.path.join(in_dir, "batch0.parquet"))

    pages = st.read_page_stream(spark, in_dir)
    q = st.start_to_parquet(st.extract_stream(pages, weights=weights),
                            out_dir, ck_dir)
    _wait_done(q)
    got = {r.url: r.text for r in spark.read.parquet(out_dir).collect()}
    truth = dict(zip(first["url"], first["text"]))
    assert got == truth  # byte-identical through the streaming path

    # a second file lands; a new availableNow run drains ONLY the new file
    second = fx.make_pages(5, seed=32)
    fx.pages_to_parquet(second, os.path.join(in_dir, "batch1.parquet"))
    q2 = st.start_to_parquet(st.extract_stream(
        st.read_page_stream(spark, in_dir), weights=weights), out_dir, ck_dir)
    _wait_done(q2)
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 13  # 8 + 5, no reprocessing of batch0
    got = {r.url: r.text for r in rows}
    truth.update(dict(zip(second["url"], second["text"])))
    assert got == truth
