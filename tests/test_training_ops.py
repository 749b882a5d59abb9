"""Training-data assembly ops: deterministic sampling, sequence packing,
hashed-linear scoring — semantics + plan shape."""

import pandas as pd

from tuatara_spark.ops import training


def test_deterministic_sample_reproducible_and_calibrated(spark):
    df = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in
         training.deterministic_sample(df, 0.3, salt="sA").collect()}
    b = {r.doc_id for r in
         training.deterministic_sample(df, 0.3, salt="sA").collect()}
    assert a == b                          # run-to-run identical
    assert abs(len(a) / 20000 - 0.3) < 0.02   # calibrated rate
    c = {r.doc_id for r in
         training.deterministic_sample(df, 0.3, salt="sB").collect()}
    assert c != a                          # salt changes the subsample
    # nesting property: rate 0.1 sample is a SUBSET of rate 0.3 (same salt)
    d = {r.doc_id for r in
         training.deterministic_sample(df, 0.1, salt="sA").collect()}
    assert d <= a


def test_stratified_rates(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(10000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = training.stratified_sample(df, {"en": 0.1, "de": 0.8},
                                     default_rate=0.0)
    counts = {r.lang: r.c for r in
              out.groupBy("lang").agg(
                  __import__("pyspark.sql.functions", fromlist=["count"])
                  .count("*").alias("c")).collect()}
    assert abs(counts["en"] / 5000 - 0.1) < 0.03
    assert abs(counts["de"] / 5000 - 0.8) < 0.03


def test_sample_plan_is_shuffle_free(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    plan = training.deterministic_sample(df, 0.5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan
    for bad in ("BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, plan


def test_pack_sequences_exact_layout(spark):
    # 5 docs of 3 tokens each, seq_len 4: offsets 0,3,6,9,12
    rows = [(i, "a b c") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           training.pack_sequences(df, seq_len=4).collect()}
    assert [out[i].offset for i in range(5)] == [0, 3, 6, 9, 12]
    assert [out[i].seq_id for i in range(5)] == [0, 0, 1, 2, 3]
    # docs 1 (tokens 3..5) and 2 (tokens 6..8) straddle a 4-token
    # boundary; docs 3 (9..11) and 4 (12..14) sit inside one sequence
    assert [out[i].crosses_boundary for i in range(5)] == \
        [False, True, True, False, False]


def test_pack_sequences_block_decomposition_matches_global(spark):
    # ragged doc lengths across MANY blocks (block_size=8) must equal the
    # trivially-computed global prefix sum
    rows = [(i, " ".join(["t"] * (1 + (i * 7) % 13))) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.offset for r in
           training.pack_sequences(df, seq_len=16, block_size=8).collect()}
    acc = 0
    for i in range(100):
        assert out[i] == acc, i
        acc += 1 + (i * 7) % 13


def test_pack_block_offsets_join_is_broadcast(spark):
    df = spark.createDataFrame([(i, "a b") for i in range(50)],
                               "doc_id long, text string")
    plan = training.pack_sequences(df, seq_len=8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "broadcast" in plan.lower(), plan


def test_hashed_linear_score_properties(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           training.hashed_linear_score(df).collect()}
    assert out[1].score_sum == out[2].score_sum   # same text, same score
    assert out[1].n_tokens == 2
    assert -500 <= out[3].score_sum <= 499        # single token in range
    assert out[3].score_e3 == out[3].score_sum * 1000


def test_cap_per_host_equals_single_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    rows = [(i, f"h{i % 3}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    got = {(r.doc_id, r.host) for r in
           training.cap_per_host(df, cap=7, salt_buckets=5).collect()}
    rk = training._md5_unit(F.col("doc_id"), "hostcap")
    w = Window.partitionBy("host").orderBy(rk, "doc_id")
    want = {(r.doc_id, r.host) for r in
            df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 7).select("doc_id", "host").collect()}
    assert got == want and len(got) == 21
    # cap larger than any host's count keeps everything
    assert training.cap_per_host(df, cap=1000).count() == 500


def test_shingle_overlap_semantics(spark):
    corpus = spark.createDataFrame(
        [(1, "a b c d e f g h i j"),        # shares 'a..h' + 'b..i' window
         (2, "z y x w v u t s r q"),        # disjoint
         (3, "a b c d e f g h X Y"),        # shares exactly one shingle
         (4, "short text")],                # < k tokens: no shingles
        "doc_id long, text string")
    ev = spark.createDataFrame([(100, "a b c d e f g h i Q")],
                               "doc_id long, text string")
    got = {r.doc_id: r.n_matched for r in
           training.shingle_overlap(corpus, ev, k=8).collect()}
    # eval shingles: 'a b c d e f g h', 'b..i', 'c..i Q'
    assert got == {1: 2, 3: 1}


def test_shingle_overlap_eval_join_is_broadcast(spark):
    df = spark.createDataFrame([(1, "a b c d e f g h")],
                               "doc_id long, text string")
    plan = training.shingle_overlap(df, df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "broadcast" in plan.lower(), plan


def test_with_order_rank_matches_global_sort(spark):
    import random
    keys = [f"https://h{i % 9}.org/p{i * 37 % 101}" for i in range(300)]
    random.Random(4).shuffle(keys)
    df = spark.createDataFrame([(k,) for k in keys], "url string")
    got = {r.url: r.rank for r in
           training.with_order_rank(df, "url", partitions=7).collect()}
    want = {u: i for i, u in enumerate(sorted(set(keys)))}
    # keys here are unique; rank must equal the global sort position
    assert got == want


def test_randomized_invariants_segment_dedup_and_packing(spark):
    """Randomized cross-check against pure-Python models: segment_dedup
    must equal the reference implementation (global counts over
    non-overlapping chunks, ordered rebuild), and pack_sequences offsets
    must be the exact prefix sum in doc order."""
    import numpy as np
    from tuatara_spark.ops import dedup
    rng = np.random.default_rng(9)
    vocab = ["a", "b", "c", "dd", "ee"]
    for trial in range(3):
        n = int(rng.integers(10, 40))
        texts = [" ".join(rng.choice(vocab,
                                     size=int(rng.integers(1, 15))))
                 for _ in range(n)]
        # plant duplicates
        for j in range(0, n, 5):
            texts[j] = texts[(j + 3) % n]
        df = spark.createDataFrame(list(enumerate(texts)),
                                   "doc_id long, text string")
        k = 2
        got = {r.doc_id: (r.n_segs, r.n_kept, r.text_dedup) for r in
               dedup.segment_dedup(df, seg_tokens=k, min_count=2)
               .collect()}
        # reference model
        def chunks(t):
            toks = t.split(" ")
            return [" ".join(toks[i:i + k])
                    for i in range(0, len(toks), k)]
        from collections import Counter
        counts = Counter(c for t in texts for c in chunks(t))
        for i, t in enumerate(texts):
            cs = chunks(t)
            kept = [c for c in cs if counts[c] < 2]
            assert got[i] == (len(cs), len(kept), " ".join(kept)), (
                trial, i, t)
        # packing prefix-sum invariant
        out = sorted(training.pack_sequences(df, seq_len=7).collect(),
                     key=lambda r: r.doc_id)
        acc = 0
        for r in out:
            assert r.offset == acc
            acc += r.n_tokens


def test_url_blocklist_suffix_semantics(spark):
    from tuatara_spark.ops import training
    urls = spark.createDataFrame(
        [("https://x.bad.com/a",), ("https://bad.com/b",),
         ("https://notbad.com/c",), ("https://ads.bad.com:8080/d",),
         ("https://good.org/e",)], "url string")
    blocked = spark.createDataFrame(
        [("bad.com",), ("ads.bad.com",)], "domain string")
    got = {r.url: (r.blocked, r.matched_domain)
           for r in training.url_blocklist(urls, blocked).collect()}
    assert got["https://x.bad.com/a"] == (True, "bad.com")
    assert got["https://bad.com/b"] == (True, "bad.com")
    # label boundary: notbad.com must NOT match bad.com
    assert got["https://notbad.com/c"] == (False, "")
    # longest (most specific) rule wins; port stripped before matching
    assert got["https://ads.bad.com:8080/d"] == (True, "ads.bad.com")
    assert got["https://good.org/e"] == (False, "")


def test_assign_splits_partition_and_stability(spark):
    """Splits partition the corpus (every row exactly one label), are
    stable under corpus growth (a key's split never changes when other
    rows arrive), and reject fractions that don't sum to 1."""
    import pytest as _pt
    from tuatara_spark.ops import training
    small = spark.range(100).withColumnRenamed("id", "doc_id")
    big = spark.range(1000).withColumnRenamed("id", "doc_id")
    s1 = {r.doc_id: r.split
          for r in training.assign_splits(small).collect()}
    s2 = {r.doc_id: r.split
          for r in training.assign_splits(big).collect()}
    assert len(s1) == 100 and set(s1.values()) <= {"train", "valid",
                                                   "test"}
    assert all(s2[k] == v for k, v in s1.items())   # growth-stable
    counts = {}
    for v in s2.values():
        counts[v] = counts.get(v, 0) + 1
    assert counts["train"] > counts["valid"] and \
        counts["train"] > counts["test"]
    with _pt.raises(ValueError):
        training.assign_splits(small, fractions={"a": 0.5, "b": 0.2})
