#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline workload mirrors the engine's production shape:
  * ocr_extract_pages — the full extraction job over a synthesized TPAGE
    pages table (size scales with sf; includes 2048² skew pages) with
    url-hash bucketing + salting, measured end-to-end;
  * minhash_lsh_pairs / simhash_pairs — near-dup dedup over documents;
  * ann_cosine_topk — brute-force cosine top-k over embeddings;
  * dedup_exact_groups, quality_score, reading_order — relational ops.

Pages are synthesized once per (sf, size) and cached under .bench_cache/
(gitignored) so repeated runs measure Spark, not the fixture generator.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from tuatara_spark import engine, fixtures as fx, partitioning as pt  # noqa: E402
from tuatara_spark import queries as Q  # noqa: E402
from tuatara_spark import weights as wt  # noqa: E402
from tuatara_spark.session import get_spark  # noqa: E402
from pyspark.sql.functions import col as F_col  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else 0.1


def bench_pages_path(sf: float, spark=None,
                     payload: str = "tpbit") -> tuple[str, int]:
    """Synthesize (once) the pages table for this sf, written as a
    multi-file parquet dir so the scan parallelizes without a shuffle.

    Default payload is TPBIT (1 bit/px packed ink — the production wire
    format, 24× smaller than raw-RGB TPG1 through scan/shuffle/Arrow);
    extraction output is byte-identical (tests/test_spark_e2e.py)."""
    n_small = max(64, int(40960 * sf))
    n_large = max(1, int(40 * sf))
    cache = os.path.join(REPO_ROOT, ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    suffix = "" if payload == "tpage" else f"_{payload}"
    path = os.path.join(cache, f"pages_sf{sf}{suffix}")
    if not os.path.exists(path):
        single = path + ".single.parquet"
        if not os.path.exists(single):
            df = fx.make_pages(n_small, seed=42, n_large=n_large,
                               payload=payload)
            fx.pages_to_parquet(df, single)
        owns = spark is None
        if owns:
            spark = get_spark("bench-synth", cores=CPUS)
        (spark.read.parquet(single).repartition(64)
         .write.mode("overwrite").parquet(path))
        if owns:
            spark.stop()
    return path, n_small + n_large


def bench_warc_path(sf: float, body_tokens: int = 40) -> tuple[str, int]:
    """Synthesize (once) a Common-Crawl-shaped WARC dataset for this sf:
    64 .warc.gz files (per-record gzip members, request/response/metadata
    triples) holding TOTAL ≈ the same page count as the extraction bench,
    with html bodies and mixed transfer codings. 64 files ⇒ the
    binaryFile scan parallelizes across all cores without a shuffle."""
    from tuatara_spark.sources import warc as W
    n = max(256, int(40960 * sf))
    n_files = 64
    cache = os.path.join(REPO_ROOT, ".bench_cache")
    suffix = "" if body_tokens == 40 else f"_b{body_tokens}"
    path = os.path.join(cache, f"warc_sf{sf}{suffix}")
    if not os.path.exists(path):
        os.makedirs(path + ".tmp", exist_ok=True)
        per = (n + n_files - 1) // n_files
        body_words = ("token%d " % i for i in range(body_tokens))
        filler = "".join(body_words)
        i = 0
        for f in range(n_files):
            pages = []
            for _ in range(min(per, n - i)):
                body = (f"<html><head><title>doc {i}</title></head><body>"
                        f"<nav>menu</nav><p>page {i} {filler}</p>"
                        f"<footer>f</footer></body></html>").encode()
                pages.append({
                    "url": f"https://bench.example/{i}",
                    "date": "2026-01-01T00:00:00Z", "status": 200,
                    "content_type": "text/html", "body": body,
                    "chunked": i % 3 == 1, "gzip_body": i % 3 == 2})
                i += 1
            with open(os.path.join(path + ".tmp", f"part-{f:04d}.warc.gz"),
                      "wb") as fh:
                fh.write(W.encode_warc(pages))
        os.rename(path + ".tmp", path)
    return path, n


def cpu_calibration_ms() -> float:
    """Fixed single-thread NumPy workload, best-of-3 — a CPU-speed probe.
    This VM shows up to ~2× CPU-regime variance BETWEEN process launches
    (while within-process timings stay tight), so the calibration line
    makes cross-round bench comparisons normalizable: same workload, same
    BLAS threading, no Spark involved."""
    import numpy as _np
    a = _np.random.default_rng(0).standard_normal((512, 512))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(20):
            a @ a
        best = min(best, time.time() - t0)
    return round(best * 1000, 1)


def run(spark, sf_dir: str) -> tuple[dict, dict]:
    sf = sf_of(sf_dir)
    timings: dict[str, float] = {}
    extra: dict = {"cpu_calib_ms": cpu_calibration_ms()}
    stats: dict = {}

    # -- extraction end-to-end (the headline) --
    pages_path, n_pages = bench_pages_path(sf, spark)
    w = wt.build_weights(42)

    def t_extract():
        pages = spark.read.parquet(pages_path)
        out = engine.extract_df(pages, weights=w)
        n_rows, n_chars = out.selectExpr(
            "count(*) AS n", "sum(n_chars) AS c").collect()[0]
        stats["pages"] = int(n_rows)
        stats["extracted_chars"] = int(n_chars)

    # the full job shape: url-hash bucketing + skew salting + explicit
    # (bucket, salt) shuffle of the payloads before extraction
    def t_salted():
        pages = pt.with_salt(pt.with_bucket(spark.read.parquet(pages_path),
                                            64))
        pages = pt.distribute(pages,
                              spark.sparkContext.defaultParallelism * 2)
        engine.extract_df(pages.drop("salt"), weights=w).count()

    # -- crawl front-end: WARC ingest → charset decode → strip --
    from tuatara_spark.ops import encoding as _enc, htmlx as _hx
    from tuatara_spark.sources import warc as _W
    warc_path, n_warc = bench_warc_path(sf)

    def t_warc():
        recs = _W.read_warc(spark, warc_path)
        decoded = _enc.sniff_decode(recs.where(F_col("error") == ""))
        stripped = _hx.strip_boilerplate(decoded, col="text")
        got = stripped.selectExpr("count(*) AS n",
                                  "sum(length(main_text)) AS c").collect()[0]
        stats["warc_pages"] = int(got[0])

    # -- relational / dedup / similarity ops --
    from tuatara_spark.ops import similarity as _sim

    def _ann_batched(spark_, sf_dir_):
        emb = spark_.read.parquet(f"{sf_dir_}/embeddings.parquet")
        return _sim.cosine_topk_batched(emb, Q._ANN_QUERY_VEC, k=20)

    def _lsh_bucket_batched(spark_, sf_dir_):
        emb = spark_.read.parquet(f"{sf_dir_}/embeddings.parquet")
        dim = len(emb.select("embedding").first()[0])
        return _sim.with_lsh_bucket_batched(
            emb, _sim.hyperplanes(dim, n_planes=8, seed=7))

    def _ivf_cell_batched(spark_, sf_dir_):
        emb = spark_.read.parquet(f"{sf_dir_}/embeddings.parquet")
        cent = _sim.ivf_centroids(emb, n_centroids=8, sample=512)
        return _sim.with_ivf_cell_batched(emb, cent)

    def _corpus_stats_sketch(spark_, sf_dir_):
        # the 100 TB twin of corpus_stats_exact: HLL distinct + KLL
        # quantiles — one pass, constant memory, no exact-distinct shuffle
        docs = spark_.read.parquet(f"{sf_dir_}/documents.parquet")
        t = docs.selectExpr("size(split(text, ' ')) AS n")
        base = t.selectExpr(
            "count(*) AS n_docs", "sum(n) AS total_tokens",
            "percentile_approx(n, array(0.25, 0.5, 0.75)) AS quartiles")
        vocab = docs.selectExpr(
            "explode(split(text, ' ')) AS tok").selectExpr(
            "approx_count_distinct(tok) AS distinct_tokens")
        return base.crossJoin(vocab)

    plan = [
        ("minhash_lsh_pairs", Q.q_minhash_lsh_pairs),
        ("simhash_pairs", Q.q_simhash_pairs),
        ("ann_cosine_topk", Q.q_ann_cosine_topk),
        ("ann_cosine_topk_batched", _ann_batched),
        ("lsh_bucket_batched", _lsh_bucket_batched),
        ("ivf_cell_batched", _ivf_cell_batched),
        ("dedup_exact_groups", Q.q_dedup_exact_groups),
        ("corpus_stats_exact", Q.q_corpus_stats_docs),
        ("corpus_stats_sketch", _corpus_stats_sketch),
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
        ("bpe_encode_docs", Q.q_bpe_encode_docs),
        ("exact_substr_docs", Q.q_exact_substr_docs),
        ("justext_docs", Q.q_justext_docs),
        ("tier_extract_docs", Q.q_tier_extract_docs),
        ("host_line_dedup_docs", Q.q_host_line_dedup_docs),
        # the higher-order array-filter plan shape (C4 line rules):
        # scan-wide lambda filter + page verdicts, zero shuffle
        ("c4_filter_docs", Q.q_c4_filter_docs),
        # scan-wide in-row hashing + window minima, one distinct shuffle
        ("winnow_docs", Q.q_winnow_docs),
        # NOT benched: cross_corpus_jaccard_pairs — like its symmetric
        # sibling ngram_jaccard_pairs it is the EXACT near-dup path
        # (~34 s at sf0.1: the fixture's word-soup docs really are
        # near-dups of each other, the prefix filter's worst case);
        # the bench-scale near-dup path is minhash/simhash above.
    ]
    from tuatara_spark.ops import dedup as _dd

    def _noop_thunk(fn):
        def th():
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return th

    # image near-dup signature over the same pages table (batched
    # integer-sum aHash; was a per-row decode + float64-mean loop)
    from tuatara_spark.ops import multimodal as _mm

    def t_phash():
        (_mm.phash64(spark.read.parquet(pages_path))
         .write.format("noop").mode("overwrite").save())

    entries = ([("ocr_extract_pages", t_extract),
                ("ocr_extract_salted_shuffle", t_salted),
                ("warc_ingest_chain", t_warc),
                ("phash64_pages", t_phash)]
               + [(name, _noop_thunk(fn)) for name, fn in plan])

    # One untimed warm-up sweep (forks + warms all python workers,
    # JIT-compiles the hot codegen stages), then PASSES timed sweeps
    # INTERLEAVED across queries — best-of per query. Sequential
    # per-query best-of let one slow CPU regime inflate whichever query
    # ran first (the round-3 ocr_extract_pages artifact); interleaving
    # spreads any regime drift across every query equally.
    for _, th in entries:
        th()
        _dd.release_caches()
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    for _ in range(n_passes):
        for name, th in entries:
            t0 = time.time()
            th()
            dt = time.time() - t0
            timings[name] = round(min(timings.get(name, float("inf")), dt), 3)
            # pair operators persist intermediates for their self-joins;
            # release between runs so iterations measure the same state
            _dd.release_caches()

    extra.update(stats)
    extra["pages_per_sec"] = round(stats["pages"]
                                   / timings["ocr_extract_pages"], 2)
    extra["warc_pages_per_sec"] = round(stats["warc_pages"]
                                        / timings["warc_ingest_chain"], 2)
    extra["bench_passes"] = n_passes
    # calibration AFTER as well: a drifting regime mid-run is then
    # visible in the artifact itself
    extra["cpu_calib_ms_after"] = cpu_calibration_ms()
    return timings, extra


def main() -> None:
    spark = get_spark("tuatara-bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    timings, extra = run(spark, SF_DIR)
    result = {
        "metric": "total_bench_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_of(SF_DIR),
        "cpus": CPUS,
        **extra,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
