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


def test_stateful_host_counters_accumulate(spark, weights, tmp_path):
    """applyInPandasWithState: per-host counters persist in the checkpoint
    and accumulate across separate availableNow runs."""
    import pandas as pd
    in_dir = str(tmp_path / "in")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)
    first = fx.make_pages(6, seed=41)
    fx.pages_to_parquet(first, os.path.join(in_dir, "b0.parquet"))

    def run_once(name):
        collected = []

        def sink(batch_df, _bid):
            collected.extend(batch_df.collect())

        counters = st.host_counter_stream(st.extract_stream(
            st.read_page_stream(spark, in_dir), weights=weights))
        q = (counters.writeStream.foreachBatch(sink)
             .outputMode("update")
             .option("checkpointLocation", ck_dir)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {r.host: (r.pages, r.chars) for r in collected}

    got1 = run_once("hc1")
    assert sum(p for p, _ in got1.values()) == 6

    second = fx.make_pages(4, seed=42)
    fx.pages_to_parquet(second, os.path.join(in_dir, "b1.parquet"))
    got2 = run_once("hc2")
    # only updated hosts re-emit; totals accumulated with batch-1 state
    assert sum(p for p, _ in got2.values()) == 4 + sum(
        got1.get(h, (0, 0))[0] for h in got2)
    for h, (p, c) in got2.items():
        assert p >= got1.get(h, (0, 0))[0]
