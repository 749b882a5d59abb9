"""Training-data assembly operators: deterministic sampling, sequence
packing, and hashed-linear quality scoring.

The last mile of an LLM data pipeline after extraction/dedup/filtering:
pick a reproducible subsample, score documents with a cheap model, and
lay documents out into fixed-length training sequences. All three are
pure Catalyst and exactly reproducible in ANSI SQL — the portability
trick is md5 (lowercase hex in both Spark and DuckDB) instead of the
engine-private xxhash64, so even the "random" choices are oracle-exact.

Scale notes (100 TB):

* ``deterministic_sample`` is a shuffle-free filter on the scan — the
  md5-prefix comparison is pure projection, so sampling composes with
  predicate pushdown and costs one pass. Being hash-keyed (not rand()),
  re-runs and retried tasks select the SAME rows — a correctness
  requirement for resumable jobs, not a convenience.
* ``pack_sequences`` needs a GLOBAL token prefix-sum; a naive
  ``Window.orderBy`` collapses to a single partition. Here: per-block
  cumsum (window partitioned by block id) + a block-totals rollup joined
  back — the block-totals table has rows/block_size entries (millions of
  docs → thousands of rows), so its own window is trivially small and
  the doc-side work stays fully parallel. One narrow shuffle.
* ``hashed_linear_score`` is the fastText-style bag-of-hashed-ngrams
  linear model (Joulin et al. 2016; the DCLM/FineWeb quality-filter
  shape): explode tokens → bucket → weight → sum. Weights are a
  DETERMINISTIC function of the bucket id (mixed-congruential), so no
  weight table needs to ship — at 10^12 rows the join against a learned
  weight table would broadcast instead; the plan shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _md5_unit(col: F.Column, salt: str) -> F.Column:
    """First 8 md5 hex digits of (value||salt) as an integer in
    [0, 16^8) — portable to ANSI SQL verbatim."""
    return F.conv(F.substring(
        F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 8), 16, 10) \
        .cast("long")


def deterministic_sample(df: DataFrame, rate: float,
                         key_col: str = "doc_id",
                         salt: str = "s1") -> DataFrame:
    """Keep a row iff md5(key||salt) lands under ``rate`` — reproducible
    across runs, engines, retries and cluster sizes."""
    thr = int(rate * 16 ** 8)
    return df.where(_md5_unit(F.col(key_col), salt) < F.lit(thr))


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      strat_col: str = "lang", key_col: str = "doc_id",
                      default_rate: float = 0.0,
                      salt: str = "s1") -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing:
    upweight low-resource langs by keeping them at higher rates). The
    rate map is a CASE expression — no join, still shuffle-free."""
    thr = F.lit(int(default_rate * 16 ** 8))
    for k, r in sorted(rates.items()):
        thr = F.when(F.col(strat_col) == k,
                     F.lit(int(r * 16 ** 8))).otherwise(thr)
    return df.where(_md5_unit(F.col(key_col), salt) < thr)


def pack_sequences(df: DataFrame, seq_len: int,
                   order_col: str = "doc_id", text_col: str = "text",
                   block_size: int = 4096) -> DataFrame:
    """Concatenation-style sequence packing: documents in ``order_col``
    order are laid end-to-end into ``seq_len``-token training sequences;
    each doc learns its global token offset, its first sequence id, and
    whether it straddles a boundary. Scalable prefix-sum: per-block
    window + tiny block-totals window (see module docstring)."""
    # the block id must be ORDER-ALIGNED with order_col (block boundaries
    # respect the global order) — numeric division gives that for numeric
    # keys; for string keys (urls) it would cast to NULL/throw and
    # collapse every row into one window partition, so refuse loudly and
    # point at the fix (assign a numeric rank first)
    kind = dict(df.dtypes).get(order_col, "")
    if kind not in ("tinyint", "smallint", "int", "bigint", "long"):
        raise TypeError(
            f"pack_sequences needs an integer order_col, got {order_col}:"
            f"{kind or '?'} — assign a numeric key first (e.g. a "
            "zipWithIndex/row_number rank over the intended order)")
    n_tok = F.size(F.split(F.col(text_col), " "))
    base = df.select(F.col(order_col).alias("_k"),
                     n_tok.alias("n_tokens"),
                     (F.col(order_col) / block_size).cast("long")
                     .alias("_blk"))
    w_in = (Window.partitionBy("_blk").orderBy("_k")
            .rowsBetween(Window.unboundedPreceding, -1))
    blk_tot = base.groupBy("_blk").agg(F.sum("n_tokens").alias("_bt"))
    w_blk = (Window.orderBy("_blk")
             .rowsBetween(Window.unboundedPreceding, -1))
    blk_off = blk_tot.select(
        "_blk", F.coalesce(F.sum("_bt").over(w_blk), F.lit(0))
        .alias("_boff"))
    out = (base
           .withColumn("_in", F.coalesce(F.sum("n_tokens").over(w_in),
                                         F.lit(0)))
           .join(F.broadcast(blk_off), "_blk")
           .withColumn("offset", (F.col("_boff") + F.col("_in"))
                       .cast("long")))
    seq_first = F.floor(F.col("offset") / seq_len).cast("long")
    seq_last = F.floor((F.col("offset") + F.greatest(F.col("n_tokens"),
                                                     F.lit(1)) - 1)
                       / seq_len).cast("long")
    return out.select(
        F.col("_k").alias(order_col),
        F.col("n_tokens").cast("long").alias("n_tokens"), "offset",
        seq_first.alias("seq_id"),
        (seq_last > seq_first).alias("crosses_boundary"))


def hashed_linear_score(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        n_buckets: int = 1 << 16,
                        salt: str = "w0") -> DataFrame:
    """fastText-shaped quality score: mean over tokens of a per-bucket
    weight in [-500, 499] (integer — exact in both engines), bucket =
    md5(token||salt) mod n_buckets, weight = mixed-congruential transform
    of the bucket. Returns (id, n_tokens, score_sum, score_e3)."""
    tok = F.explode(F.split(F.col(text_col), " ")).alias("tok")
    t = df.select(F.col(id_col), tok)
    bucket = F.pmod(_md5_unit(F.col("tok"), salt), F.lit(n_buckets))
    weight = F.pmod(bucket * F.lit(2654435761) + F.lit(104729),
                    F.lit(1000)) - F.lit(500)
    scored = t.select(id_col, weight.alias("w"))
    return (scored.groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_tokens"),
                 F.sum("w").cast("long").alias("score_sum"))
            .withColumn(
                "score_e3",
                F.floor(F.col("score_sum").cast("double") * 1000
                        / F.col("n_tokens") + F.lit(0.5)).cast("long")))


def cap_per_host(df: DataFrame, cap: int, host_col: str = "host",
                 id_col: str = "doc_id",
                 salt_buckets: int = 16) -> DataFrame:
    """Per-host document cap (crawl balancing: no single domain may
    dominate the corpus — the FineWeb/CCNet host-cap shape). Keeps, per
    host, the ``cap`` documents with the smallest md5 rank key —
    deterministic "random" selection, stable across runs and engines.

    Skew-safe two-phase top-k: a mega-host (1e9 rows behind one portal
    domain) would funnel a naive ``row_number() OVER (PARTITION BY
    host)`` into ONE task. Phase 1 caps within (host, rank_key mod
    ``salt_buckets``) — each salted partition keeps its own top-``cap``,
    bounding any host to salt_buckets×cap rows; phase 2 applies the
    exact global cap on that superset. Every salted top-``cap`` set is a
    superset of its share of the global top-``cap``, so the result is
    EXACTLY the single-window answer, shuffle skew bounded."""
    rk = _md5_unit(F.col(id_col), "hostcap").alias("_rk")
    base = df.select(F.col(id_col), F.col(host_col), rk)
    w1 = (Window.partitionBy(host_col, F.pmod(F.col("_rk"),
                                              F.lit(salt_buckets)))
          .orderBy("_rk", id_col))
    pre = (base.withColumn("_r1", F.row_number().over(w1))
           .where(F.col("_r1") <= cap).drop("_r1"))
    w2 = Window.partitionBy(host_col).orderBy("_rk", id_col)
    return (pre.withColumn("_r2", F.row_number().over(w2))
            .where(F.col("_r2") <= cap)
            .select(id_col, host_col))


def shingle_overlap(df: DataFrame, eval_df: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    k: int = 8) -> DataFrame:
    """Eval-set decontamination (the GPT-3/PaLM n-gram collision check:
    flag training documents sharing any k-token shingle with a held-out
    benchmark). Returns (id, n_matched) for corpus documents with ≥1
    distinct shared shingle.

    Shingling is a shuffle-free ``transform`` over the token array
    (overlapping stride-1 windows); the eval shingle set — benchmarks
    are tiny next to a 10^12-row corpus — broadcasts into the join, so
    the corpus side never shuffles until the per-doc count. Pure
    Catalyst, exactly reproducible in SQL."""
    def shingles(d: DataFrame) -> DataFrame:
        toks = F.split(F.col(text_col), " ")
        n = F.size(toks)
        segs = F.when(n >= k, F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda s: F.array_join(F.slice(toks, s, k), " "))
        ).otherwise(F.array().cast("array<string>"))
        return d.select(F.col(id_col), F.explode(segs).alias("shingle"))

    ev = shingles(eval_df).select("shingle").distinct()
    corp = shingles(df)
    return (corp.join(F.broadcast(ev), "shingle")
            .groupBy(id_col)
            .agg(F.count_distinct("shingle").cast("long")
                 .alias("n_matched")))


def with_order_rank(df: DataFrame, order_col: str,
                    rank_col: str = "rank",
                    partitions: int | None = None,
                    tiebreak_col: str | None = None) -> DataFrame:
    """Dense 0-based global rank in ``order_col`` order WITHOUT a
    single-partition window: repartitionByRange on the key (Spark's
    sampled range partitioner keeps partitions balanced), rank within
    each partition, then add broadcast per-partition offsets — the same
    two-level prefix-sum shape as pack_sequences. Makes string-keyed
    corpora (urls) packable: ``pack_sequences(with_order_rank(df,'url'),
    order_col='rank')``. Ties broken by the column's total order only if
    keys are unique — duplicate keys get arbitrary but stable-in-run
    rank order within the key."""
    from tuatara_spark.ops.dedup import _persist
    n_parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    order_keys = [F.col(order_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else [])
    # Persist the ranged table: the partition-id → offset contract must
    # hold across the counts pass and the rank pass (one
    # materialization pins it), and callers' downstream passes reuse
    # the cache. The per-partition counts come back as ONE driver
    # round-trip (n_parts rows — the hits/bpe_train scalar precedent)
    # and the offsets enter the plan as an array LITERAL indexed by
    # partition id, replacing the old counts exchange + offsets window
    # + per-row broadcast join. Release via dedup.release_caches().
    part = _persist(df.repartitionByRange(n_parts, *order_keys)
                    .withColumn("_pid", F.spark_partition_id()))
    counts = {r["_pid"]: r["_n"] for r in
              part.groupBy("_pid").agg(F.count("*").alias("_n"))
              .collect()}
    offs, acc = [], 0
    for pid in range(max(counts) + 1 if counts else 0):
        offs.append(acc)
        acc += counts.get(pid, 0)
    w_in = (Window.partitionBy("_pid").orderBy(*order_keys)
            .rowsBetween(Window.unboundedPreceding, -1))
    off_expr = (F.element_at(F.array(*[F.lit(o) for o in offs]),
                             F.col("_pid") + 1)
                if offs else F.lit(0))
    return (part
            .withColumn("_in", F.coalesce(F.count("*").over(w_in),
                                          F.lit(0)))
            .withColumn(rank_col, (off_expr + F.col("_in"))
                        .cast("long"))
            .drop("_pid", "_in"))


def url_blocklist(df: DataFrame, blocked: DataFrame,
                  url_col: str = "url") -> DataFrame:
    """Domain-blocklist filtering (the UT1/adult-domain pass every
    public crawl pipeline runs first): a URL is blocked when ANY
    label-boundary suffix of its host — ``a.b.c`` → {a.b.c, b.c, c} —
    appears in ``blocked`` (one ``domain`` column). Label boundaries
    matter: ``nottracker.net`` must NOT match a ``tracker.net`` entry,
    which substring/endswith checks get wrong.

    Adds ``host``, ``blocked`` and ``matched_domain`` (the LONGEST
    matching suffix — most specific rule, deterministic).

    Scale shape: each URL explodes into its ≤label-count suffix chain
    (a tiny per-row ``transform``) and joins the blocklist on the
    suffix — a broadcast hash join for any real blocklist (UT1 ≈ 4M
    rows ≈ tens of MB), degrading to a shuffle join on the suffix key
    if a caller feeds something enormous. No regex scan over the list,
    no O(|list|) per-row work — cost is O(host labels) per URL.
    """
    host = F.regexp_replace(
        F.regexp_extract(F.lower(F.col(url_col)), r"^https?://([^/?#]+)", 1),
        r":\d+$", "")
    u = df.withColumn("host", host)
    labels = F.split(F.col("host"), r"\.")
    chain = F.transform(
        F.sequence(F.lit(0), F.size(labels) - 1),
        lambda i: F.array_join(F.slice(labels, i + 1, F.size(labels) - i),
                               "."))
    sfx = u.select(F.col(url_col), F.explode(chain).alias("_sfx"))
    b = blocked.select(F.col("domain").alias("_sfx")).distinct()
    hits = (sfx.join(b, "_sfx")
            .groupBy(url_col)
            .agg(F.max(F.struct(F.length("_sfx").alias("l"),
                                F.col("_sfx").alias("d"))).alias("_m"))
            .select(url_col, F.col("_m.d").alias("matched_domain")))
    return (u.join(hits, url_col, "left")
            .withColumn("blocked", F.col("matched_domain").isNotNull())
            .withColumn("matched_domain",
                        F.coalesce("matched_domain", F.lit(""))))


def chunk_text(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", max_tokens: int = 128,
               stride: int = 96) -> DataFrame:
    """Sliding-window document chunking — the training-example
    windowing step every LM data pipeline runs between cleaning and
    packing (the public BERT/GPT convention: fixed ``max_tokens``
    windows whose starts advance by ``stride`` tokens, so consecutive
    chunks overlap by ``max_tokens - stride``).

    Tokens are the whitespace-split non-empty runs. Chunk starts are
    0, stride, 2·stride, … while start < n_tokens (Spark's inclusive
    ``sequence(0, n-1, stride)``), so the final chunk may be short and
    an empty document yields no rows.

    → (id_col, chunk_idx, start_token, n_chunk_tokens, chunk_text).

    Scale shape: a shuffle-free Generate projection — starts and
    slices are in-row array ops; a 10^12-document corpus chunks with
    zero data movement, and the output inherits the input
    partitioning for the packer downstream.
    """
    if stride < 1 or max_tokens < 1:
        raise ValueError("max_tokens and stride must be >= 1")
    toks = df.select(
        F.col(id_col),
        F.expr(rf"filter(split({text_col}, '\\s+'), "
               "x -> x != '')").alias("_toks"))
    starts = toks.where(F.size("_toks") > 0).select(
        id_col, "_toks",
        F.posexplode(F.expr(
            f"sequence(0, size(_toks) - 1, {stride})"))
        .alias("chunk_idx", "start_token"))
    piece = F.expr(f"slice(_toks, start_token + 1, {max_tokens})")
    return starts.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start_token").cast("long").alias("start_token"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"))


def domain_mix(df: DataFrame, host_col: str = "host",
               id_col: str = "doc_id",
               target_e6: int = 500_000) -> DataFrame:
    """Temperature-based domain mixing — the corpus-balancing step the
    GPT-3 / PaLM data recipes publish (sample domains proportional to
    size^α with α < 1 so giant hosts stop dominating; α = 1/2 here,
    the common choice, kept integer-exact because IEEE-754 sqrt is
    correctly rounded, so floor(sqrt(n)) IS isqrt(n) for n < 2^52).

    Per host: ``weight = isqrt(n_docs)``;
    ``share_e6 = (10^6·weight) div Σweights`` (the mixture
    probability); and the per-doc keep rate that realizes a
    ``target_e6``/10^6 global sampling fraction under that mixture:

        keep_rate_e6 = min(10^6, (target_e6 · share_e6)
                           div max(1, (10^6·n_docs) div N))

    (intermediates bounded ≤ 10^18, no overflow at 10^12 docs). The
    keep decision is the deterministic portable hash
    ``md5(id)[0:8] % 10^6 < keep_rate_e6`` — reproducible across
    engines and runs.

    → (host, n_docs, weight, share_e6, keep_rate_e6, n_kept).

    Scale shape: one map-side-combinable groupBy(host); the totals are
    a 1-row broadcast; per-doc decisions are a projection joined to
    the 1-row-per-host rate table; the final count partially
    aggregates. 10^12 docs cross the wire as two host-keyed count
    shuffles — never text.
    """
    per = df.groupBy(host_col).agg(
        F.count("*").cast("long").alias("n_docs"))
    w = per.withColumn(
        "weight", F.expr("CAST(floor(sqrt(n_docs)) AS BIGINT)"))
    tot = w.agg(F.sum("weight").alias("_tw"),
                F.sum("n_docs").alias("_n"))
    rates = (w.crossJoin(F.broadcast(tot))
             .withColumn("share_e6",
                         F.expr("(1000000 * weight) div _tw"))
             .withColumn("keep_rate_e6", F.expr(
                 f"least(1000000L, ({target_e6} * share_e6) div "
                 "greatest(1L, (1000000 * n_docs) div _n))"))
             .select(F.col(host_col).alias("host"), "n_docs", "weight",
                     "share_e6", "keep_rate_e6"))
    doc_hash = (f"CAST(conv(substring(md5(cast({id_col} as string)), "
                "1, 8), 16, 10) AS BIGINT)")
    kept = (df.select(F.col(host_col).alias("host"),
                      F.expr(doc_hash).alias("_h"))
            .join(rates.select("host", "keep_rate_e6"), "host")
            .groupBy("host")
            .agg(F.sum((F.col("_h") % 1_000_000
                        < F.col("keep_rate_e6")).cast("long"))
                 .alias("n_kept")))
    return rates.join(kept, "host")


def assign_splits(df: DataFrame,
                  fractions: dict[str, float] | None = None,
                  key_col: str = "doc_id", salt: str = "s1") -> DataFrame:
    """Deterministic train/valid/test assignment: every row gets a
    ``split`` label by where md5(key||salt) lands among cumulative
    fraction thresholds (insertion order of ``fractions``; fractions
    must sum to 1). The corpus-release primitive sampling can't give —
    a PARTITION of the corpus, reproducible across runs, engines,
    retries and cluster sizes, stable under corpus growth (a document's
    split never changes when other documents arrive), and safe against
    leakage (the same key always lands in the same split, so a
    re-crawled duplicate cannot drift from train into test).

    Scale shape: one shuffle-free codegen projection (an md5 + a CASE
    chain); composes with the decontamination and dedup ops upstream.
    """
    fractions = fractions or {"train": 0.9, "valid": 0.05, "test": 0.05}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    unit = _md5_unit(F.col(key_col), salt)
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        thr = int(cum * 16 ** 8)
        branch = F.when(unit < F.lit(thr), F.lit(name))
        expr = branch if expr is None else expr.when(unit < F.lit(thr),
                                                     F.lit(name))
    expr = (expr.otherwise(F.lit(names[-1])) if expr is not None
            else F.lit(names[-1]))
    return df.withColumn("split", expr)
