#!/usr/bin/env python
"""Capture .explain("formatted") for the headline queries into
BENCH/PLANS.md — the plan-hygiene evidence (pushdown, broadcast, codegen,
no Python eval in relational paths) as an inspectable artifact rather
than only pytest assertions (tests/test_plans.py remains the enforcing
gate)."""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from tuatara_spark import queries as Q  # noqa: E402
from tuatara_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# (query, what the plan must show)
AUDIT = [
    ("pricing_summary_lineitem",
     "filter pushed to parquet (PushedFilters), pruned ReadSchema, "
     "partial HashAggregate before the exchange, WholeStageCodegen"),
    ("segment_dedup_docs",
     "ONE exchange for the distinct-segment count, BroadcastHashJoin "
     "(LeftAnti) for the drop list, no Python nodes"),
    ("sample_stratified_docs",
     "Filter directly over the scan, md5 CASE inlined; the ONLY "
     "Exchange/Sort is the query's oracle-determinism ORDER BY — the "
     "operator itself is shuffle-free (tests/test_training_ops.py "
     "asserts zero Exchange on the bare op)"),
    ("host_cap_docs",
     "two Window nodes — salted pre-cap then exact cap — both behind "
     "hash exchanges on (host[, salt]); no global single-partition sort"),
    ("sequence_pack_docs",
     "per-block Window + broadcast of the block-offset rollup; the only "
     "unpartitioned window runs on the tiny block-totals side"),
    ("quality_classifier_docs",
     "explode + partial aggregation map-side; single exchange on doc_id"),
    ("decontaminate_docs",
     "shuffle-free shingling (transform over token arrays), broadcast "
     "eval-shingle join, partial aggregation on the per-doc count"),
    ("sequence_pack_urls",
     "range-partition rank (no single-partition sort on the data side) "
     "with per-partition offsets baked as literals from one driver "
     "round-trip (round 6); the pack level's block-offset rollup is "
     "still a broadcast"),
    ("minhash_lsh_pairs",
     "narrow (id, band) shuffle for candidates, no CartesianProduct"),
    ("ann_cosine_topk",
     "TakeOrderedAndProject (global top-k without a full sort)"),
    ("cdx_index_docs",
     "pure-Catalyst projection into ONE range-partitioned global sort "
     "on (surt, ts14) — the sharded-index build shape; no Python nodes"),
    ("pagerank_hosts",
     "per-iteration src-keyed joins + partial-aggregated groupBy(dst); "
     "no CartesianProduct, no Python nodes"),
    ("bm25_rank_docs",
     "term filter before any exchange, partial-aggregated tf/df/dl, "
     "BroadcastNestedLoopJoin only for the 1-row scalars, final "
     "TakeOrderedAndProject"),
    ("dup_ngram_docs",
     "every groupBy/join clustered by the doc id behind the one "
     "widening repartition; lead windows partitioned by id (no global "
     "window)"),
    ("anchor_stats_docs",
     "two partial-aggregated groupBys then a window over collapsed "
     "(dst, anchor, count) rows"),
    # -- round 5 --
    ("tier_extract_docs",
     "InMemoryTableScan on the persisted fan-out nodes (JusText runs "
     "once per action); gates are Filters BEFORE the dedup exchange; "
     "the dedup shuffle carries (md5, id) only; no Python nodes, no "
     "CartesianProduct"),
    ("justext_docs",
     "ONE url-keyed hashpartitioning feeds both context windows and "
     "the final aggregation; pure Catalyst"),
    ("host_line_dedup_docs",
     "counting stages exchange only xxhash64 keys (text appears in no "
     "aggregate feeding an exchange); the rebuild is an in-row filter "
     "after one doc-keyed join"),
    ("domain_mix_docs",
     "partial-aggregated groupBy(host); totals as a 1-row "
     "BroadcastNestedLoopJoin; keep decisions a projection joined to "
     "the per-host rate table"),
    ("extraction_pr_gate",
     "two narrow (doc_id, tok) count shuffles; full outer join of the "
     "count tables; single-row final aggregate"),
    ("chunk_text_docs",
     "shuffle-free Generate (posexplode over in-row start sequence); "
     "the only Sort is the oracle-determinism ORDER BY"),
    # -- late round 5 --
    ("trustrank_hosts",
     "seed indicator enters as a BroadcastHashJoin; per-iteration "
     "src-keyed edge join + partial-aggregated groupBy(dst); no "
     "CartesianProduct, no Python nodes"),
    ("crawl_diff_docs",
     "ONE full-outer SortMergeJoin on the key; classification is a "
     "codegen projection; no window"),
    ("c4_filter_docs",
     "higher-order array filter + page verdicts entirely inside "
     "WholeStageCodegen; zero Exchange before the oracle ORDER BY"),
    ("host_components_docs",
     "per-round narrow (node, label) join + partial-aggregated "
     "groupBy; InMemoryTableScan on the persisted label table"),
    ("lm_kn_score_docs",
     "three broadcast model joins + 1-row T broadcast; the only data "
     "shuffle is the per-document groupBy; no SortMergeJoin"),
    ("frontier_pipeline_docs",
     "candidate stream reaches the per-host politeness window through "
     "broadcast joins only (blocklist, bloom bitmap, probe result)"),
    ("token_quantiles_docs",
     "range-partitioned two-level rank; n and target ranks are "
     "broadcasts; no single-partition window over the data"),
    ("fold_accents_docs",
     "literal-replace chain + one translate, shuffle-free projection"),
    ("mojibake_fix_docs",
     "generated literal-replace chain, shuffle-free projection"),
]


def main() -> None:
    spark = get_spark("plan-audit", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    out = ["# Physical plans — headline queries",
           "",
           f"Captured by tools/plan_audit.py at {SF_DIR} "
           "(AQE on; plans shown pre-execution). tests/test_plans.py "
           "asserts the load-bearing properties; this file is the "
           "human-readable evidence.", ""]
    for name, expect in AUDIT:
        fn, _ = Q.REGISTRY[name]
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        out += [f"## {name}", "", f"Expected properties: {expect}", "",
                "```", buf.getvalue().rstrip(), "```", ""]
        print(f"captured {name}", file=sys.stderr)
    with open(os.path.join(REPO_ROOT, "BENCH", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
