"""CDX(J) capture-index generation — the third Common Crawl artifact
family (WARC archives + WET/WAT derivatives + the CDX URL index that
makes them searchable).

Clean-room from the PUBLIC formats: the CDXJ line format used by
pywb/OpenWayback (``<searchable-key> <14-digit-timestamp> <JSON>``,
sorted lexicographically so captures for one URL are adjacent and
range-scannable) and the SURT key transform (Sort-friendly URI
Reordering Transform, from the Heritrix/webarchive docs): lowercase,
scheme dropped, leading ``www``-prefix dropped, default ports dropped,
host labels REVERSED and comma-joined, then ``)`` + path + the query
with its parameters SORTED (canonicalization makes ``?a=1&b=2`` and
``?b=2&a=1`` the same key). Example::

    https://www.Sub.Example.com/p/1?b=2&a=1
      -> com,example,sub)/p/1?a=1&b=2

Deviation (documented): the per-capture content digest is SHA-256 hex,
not Common Crawl's SHA1-base32 — neither SHA-1 nor base32 exists in
both engines here, and the invariant being rebuilt is the index
structure, not the hash constant.

Scale notes (100 TB): everything per-row is pure Catalyst string work —
no Python, no shuffle. The global (surt, ts) order comes from ONE
``orderBy``, i.e. Spark's sampled range partitioner + per-partition
sort: the standard distributed sort, producing part files that
concatenate into a fully sorted index (this is exactly how the ZipNum
sharded CDX is built). Reference parity: jackvial/tuatara has no index
layer (README.md:1-15); this extends the crawl front end the same way
WET/WAT do (sources/warc.py:350,430).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def surt_key(url_col: str = "url") -> "F.Column":
    """SURT + query-canonicalized sort key for one URL column — pure
    Catalyst, usable standalone (e.g. as a dedup/partition key)."""
    u = F.lower(F.col(url_col))
    host = F.regexp_extract(u, r"^https?://([^/?#]+)", 1)
    host = F.regexp_replace(host, r":(80|443)$", "")
    host = F.regexp_replace(host, r"^www\d*\.", "")
    # a surviving NON-default port rides after the reversed host
    # (com,example,h:8080), per the Heritrix SURT examples
    port = F.regexp_extract(host, r":(\d+)$", 1)
    hostname = F.regexp_replace(host, r":\d+$", "")
    rev = F.concat(
        F.array_join(F.reverse(F.split(hostname, r"\.")), ","),
        F.when(port == "", F.lit(""))
        .otherwise(F.concat(F.lit(":"), port)))
    path = F.regexp_extract(u, r"^https?://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(u, r"\?([^#]*)", 1)
    qsorted = F.array_join(F.array_sort(F.split(q, "&")), "&")
    return F.concat(rev, F.lit(")"), path,
                    F.when(q == "", F.lit(""))
                    .otherwise(F.concat(F.lit("?"), qsorted)))


def cdx_index(df: DataFrame, url_col: str = "url",
              ts_col: str = "warc_ts", payload_col: str = "html",
              mime: str = "text/html") -> DataFrame:
    """(surt, ts14, url, mime, status?, digest, length, cdxj_line),
    globally sorted by (surt, ts14). ``ts_col`` may be an ISO-8601
    string or timestamp; it becomes the CDX 14-digit form. The CDXJ
    line is assembled by explicit concatenation (field order and
    spacing pinned — engine-independent, hash-stable)."""
    ts14 = F.substring(
        F.regexp_replace(F.col(ts_col).cast("string"), r"[^0-9]", ""),
        1, 14)
    digest = F.sha2(F.col(payload_col), 256)
    length = F.length(F.col(payload_col)).cast("long")
    out = df.select(
        surt_key(url_col).alias("surt"), ts14.alias("ts14"),
        F.col(url_col).alias("url"), F.lit(mime).alias("mime"),
        digest.alias("digest"), length.alias("length"))
    line = F.concat(
        F.col("surt"), F.lit(" "), F.col("ts14"),
        F.lit(' {"url": "'), F.col("url"),
        F.lit('", "mime": "'), F.col("mime"),
        F.lit('", "digest": "'), F.col("digest"),
        F.lit('", "length": "'), F.col("length").cast("string"),
        F.lit('"}'))
    return (out.withColumn("cdxj_line", line)
            .orderBy("surt", "ts14"))


def generation_diff(old: DataFrame, new: DataFrame,
                    key_col: str = "url",
                    digest_col: str = "digest") -> DataFrame:
    """Incremental-crawl delta between two crawl generations' capture
    indexes → (key, status, old_digest, new_digest) with status in
    {added, removed, changed, unchanged}.

    This is the index-level comparison every recurring crawl runs
    before scheduling: ``added``/``changed`` keys go back to the fetch
    frontier, ``unchanged`` keys feed revisit records
    (sources/warc.py ``revisit_records`` — WARC 1.1 §6.7.2) instead of
    re-storing payloads, and ``removed`` keys age out of the index.
    Inputs are one row per key per generation (dedupe upstream with the
    latest capture per key, e.g. via :func:`cdx_index`'s (surt, ts14)
    order); digests compare content, so a recrawl that returns
    byte-identical HTML is ``unchanged`` even when timestamps moved.

    Scale shape (10^12-key indexes): ONE full-outer shuffle join on the
    key — both sides hash-partition on the same key, so co-partitioned
    or bucketed-by-url generations join with zero extra exchange; no
    window, no driver state. Output classification is a narrow
    projection inside codegen.
    """
    o = old.select(F.col(key_col).alias("key"),
                   F.col(digest_col).alias("old_digest"))
    n = new.select(F.col(key_col).alias("key"),
                   F.col(digest_col).alias("new_digest"))
    j = o.join(n, "key", "full_outer")
    status = (F.when(F.col("old_digest").isNull(), F.lit("added"))
              .when(F.col("new_digest").isNull(), F.lit("removed"))
              .when(F.col("old_digest") == F.col("new_digest"),
                    F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return j.select("key", status.alias("status"),
                    F.coalesce("old_digest", F.lit("")).alias("old_digest"),
                    F.coalesce("new_digest", F.lit("")).alias("new_digest"))
