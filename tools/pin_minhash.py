#!/usr/bin/env python
"""Pin the minhash_lsh_pairs in-bench-vs-isolated residual (round-4
judge item: 6.4 s in-bench vs ~3.7 s isolated-warm, hypothesis blamed
"session cache/heap state" without a measurement).

Design: ONE JVM (this VM's CPU regime varies up to ~2x BETWEEN process
launches, so only same-session comparisons are fair), three conditions
interleaved round-robin so regime drift lands on each equally:

  isolated     minhash with nothing else having run since the previous
               minhash (matches the round-4 "isolated-warm" number)
  context      the full bench suite minus minhash runs first, then
               minhash (matches the in-bench position)
  context_gc   same, but spark.catalog.clearCache() + driver/executor
               System.gc() immediately before minhash — if this
               restores the isolated time, accumulated heap/cache state
               owns the residual; if not, the owner is elsewhere
               (shuffle-file accumulation, codegen cache, ...)

Per minhash run we record wall seconds, the JVM garbage-collector time
delta (all GC beans; local mode = executors share the driver JVM so
this covers every thread), and heap-used before the run. Output: one
JSON blob to stdout + BENCH/minhash_residual.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import bench  # noqa: E402
from tuatara_spark import queries as Q  # noqa: E402
from tuatara_spark.ops import dedup as _dd  # noqa: E402
from tuatara_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("PIN_MINHASH_ROUNDS", "4"))
CONDS = tuple(os.environ.get("PIN_MINHASH_CONDS",
                             "isolated,context,context_gc").split(","))


def main() -> None:
    spark = get_spark("pin-minhash", cores=bench.CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    jmx = spark.sparkContext._jvm.java.lang.management.ManagementFactory
    beans = jmx.getGarbageCollectorMXBeans()

    def gc_ms() -> int:
        return sum(b.getCollectionTime() for b in beans)

    def heap_mb() -> int:
        return jmx.getMemoryMXBean().getHeapMemoryUsage().getUsed() // 2**20

    def jit_ms() -> int:
        return jmx.getCompilationMXBean().getTotalCompilationTime()

    def minhash() -> float:
        t0 = time.time()
        (Q.q_minhash_lsh_pairs(spark, SF_DIR)
         .write.format("noop").mode("overwrite").save())
        dt = time.time() - t0
        _dd.release_caches()
        return dt

    # the bench suite minus minhash, same noop sink, in bench order
    def context_suite() -> None:
        timings: dict = {}
        stats: dict = {}
        saved = bench.run
        # reuse bench's own entry list by running its plan by hand:
        # (bench.run would re-time everything; we only need the work)
        sf = bench.sf_of(SF_DIR)
        pages_path, _ = bench.bench_pages_path(sf, spark)
        from tuatara_spark import engine, weights as wt
        from tuatara_spark.ops import encoding as _enc, htmlx as _hx
        from tuatara_spark.ops import multimodal as _mm
        from tuatara_spark.sources import warc as _W
        from pyspark.sql.functions import col
        w = wt.build_weights(42)
        engine.extract_df(spark.read.parquet(pages_path),
                          weights=w).selectExpr("sum(n_chars)").collect()
        warc_path, _ = bench.bench_warc_path(sf)
        recs = _W.read_warc(spark, warc_path)
        (_hx.strip_boilerplate(_enc.sniff_decode(recs.where(col("error") == "")),
                               col="text")
         .selectExpr("sum(length(main_text))").collect())
        (_mm.phash64(spark.read.parquet(pages_path))
         .write.format("noop").mode("overwrite").save())
        for name, fn in [
                ("simhash_pairs", Q.q_simhash_pairs),
                ("ann_cosine_topk", Q.q_ann_cosine_topk),
                ("dedup_exact_groups", Q.q_dedup_exact_groups),
                ("corpus_stats_exact", Q.q_corpus_stats_docs),
                ("segment_dedup_docs", Q.q_segment_dedup_docs),
                ("quality_classifier_docs", Q.q_quality_classifier_docs),
                ("sequence_pack_docs", Q.q_sequence_pack_docs),
                ("quality_score_documents", Q.q_quality_score_documents),
                ("gopher_quality_docs", Q.q_gopher_quality_docs),
                ("html_main_chain_docs", Q.q_html_main_chain_docs),
                ("crawl_pipeline_docs", Q.q_crawl_pipeline_docs),
                ("reading_order_events", Q.q_reading_order_events),
                ("ocr_extract_docs", Q.q_ocr_extract_docs),
                ("lm_score_docs", Q.q_lm_score_docs),
                ("lm_tier_docs", Q.q_lm_tier_docs),
                ("langid_docs", Q.q_langid_docs),
                ("inverted_index_docs", Q.q_inverted_index_docs),
                ("hits_hosts", Q.q_hits_hosts),
                ("bpe_encode_docs", Q.q_bpe_encode_docs)]:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            _dd.release_caches()
        assert bench.run is saved  # silence unused-var lint

    def force_gc() -> None:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)

    # warm-up: full suite + minhash once (forks workers, JITs codegen)
    context_suite()
    minhash()

    runs: list[dict] = []
    for rnd in range(ROUNDS):
        for cond in CONDS:
            if cond != "isolated":
                context_suite()
            if cond == "context_gc":
                force_gc()
            calib0 = bench.cpu_calibration_ms()
            g0, h0, j0 = gc_ms(), heap_mb(), jit_ms()
            dt = minhash()
            runs.append({"round": rnd, "cond": cond,
                         "sec": round(dt, 3),
                         "gc_delta_ms": gc_ms() - g0,
                         "jit_delta_ms": jit_ms() - j0,
                         "calib_before_ms": calib0,
                         "heap_before_mb": h0})
            print(json.dumps(runs[-1]), flush=True)

    summary = {}
    for cond in CONDS:
        sel = [r for r in runs if r["cond"] == cond]
        if not sel:
            continue
        xs = sorted(r["sec"] for r in sel)

        def med(key):
            v = sorted(r[key] for r in sel)
            return v[len(v) // 2]
        summary[cond] = {"best": xs[0], "median": xs[len(xs) // 2],
                         "worst": xs[-1],
                         "gc_median_ms": med("gc_delta_ms"),
                         "jit_median_ms": med("jit_delta_ms"),
                         "calib_median_ms": med("calib_before_ms")}
    out = {"sf_dir": SF_DIR, "rounds": ROUNDS, "runs": runs,
           "summary": summary,
           "calib_ms": bench.cpu_calibration_ms()}
    out_name = os.environ.get("PIN_MINHASH_OUT", "minhash_residual.json")
    with open(os.path.join(REPO_ROOT, "BENCH", out_name), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"summary": summary, "calib_ms": out["calib_ms"]}))
    spark.stop()


if __name__ == "__main__":
    main()
