"""Url-hash bucket partitioning with explicit salting for skewed pages.

north_rule: "partitioning / shuffle / skew handled explicitly … url-hash
ranges with explicit salting for skewed large-page partitions".

Two-level scheme:

* ``bucket = pmod(xxhash64(url), num_buckets)`` — the STABLE unit of work,
  commit, and resume (a pure function of the url, so re-runs see the same
  buckets regardless of cluster size or input order).
* ``salt`` — heavy pages (html length > heavy_bytes) additionally get
  ``pmod(xxhash64(url, 1), salt_buckets)``; the physical shuffle keys on
  (bucket, salt), so heavy pages that hash into the same bucket spread
  across different tasks instead of serializing one straggler task. AQE
  can't do this for us: its skew handling only triggers on joins/sort
  aggregations, not on a mapInArrow over hash partitions.

All expressions are native Catalyst (xxhash64/pmod/length) — JVM-side,
whole-stage-codegen, no Python in the partitioning path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_NUM_BUCKETS = 64          # commit/resume granularity (sandbox scale;
                                  # at 10^12 rows this would be e.g. 2^14)
DEFAULT_HEAVY_BYTES = 1 << 20     # pages above 1 MiB payload count as heavy
DEFAULT_SALT_BUCKETS = 16


# NULL urls hash to a sentinel so every row lands in a real bucket and is
# processed/counted instead of silently dropped by the bucket filter.
_NULL_URL_SENTINEL = "\x00null-url"


def _url(url_col: str):
    return F.coalesce(F.col(url_col), F.lit(_NULL_URL_SENTINEL))


def with_bucket(df: DataFrame, num_buckets: int = DEFAULT_NUM_BUCKETS,
                url_col: str = "url") -> DataFrame:
    """Add the stable url-hash bucket column ``part_id``."""
    return df.withColumn(
        "part_id", F.pmod(F.xxhash64(_url(url_col)), F.lit(num_buckets))
        .cast("int"))


def with_salt(df: DataFrame, heavy_bytes: int = DEFAULT_HEAVY_BYTES,
              salt_buckets: int = DEFAULT_SALT_BUCKETS,
              url_col: str = "url", payload_col: str = "html") -> DataFrame:
    """Add ``salt``: 0 for normal rows; a second, independent url hash for
    heavy rows so they spread across tasks within a bucket."""
    heavy = F.length(F.col(payload_col)) > F.lit(heavy_bytes)
    salt = F.when(
        heavy,
        F.pmod(F.xxhash64(_url(url_col), F.lit(1)), F.lit(salt_buckets)))
    return df.withColumn("salt", salt.otherwise(F.lit(0)).cast("int"))


def distribute(df: DataFrame, num_tasks: int) -> DataFrame:
    """Physical repartition on (part_id, salt) — the explicit shuffle that
    balances extraction work. Requires with_bucket + with_salt first."""
    return df.repartition(num_tasks, F.col("part_id"), F.col("salt"))


def partition_histogram(df: DataFrame) -> DataFrame:
    """Diagnostic: per physical partition, row count and payload bytes —
    used by skew tests and ops. Stays in the JVM (spark_partition_id)."""
    return (df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(F.count("*").alias("rows"),
                 F.sum(F.length("html")).alias("bytes"))
            .orderBy("pid"))
