"""Temporal join operators Spark lacks natively: as-of join and range
join — expressed as compositions of built-in DataFrame ops (union +
window carry-forward; interval bucketing), never a Python UDF and never a
cartesian product.

Scale notes (100 TB): the as-of join is ONE shuffle on the key (the union
sorts within key partitions — exactly the sort-merge machinery a native
as-of would use); memory per task is one carried payload row, not a
buffered window. The range join expands each interval into its covering
buckets so the probe is an equi-join on (key, bucket) — the standard
interval-bucketing trick; bucket width trades fan-out against per-bucket
candidate count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str = "user_id",
              ts: str = "ts", payload_cols: tuple = ("value",),
              suffix: str = "_asof") -> DataFrame:
    """For every left row, attach the payload of the LATEST right row with
    ``right.ts <= left.ts`` for the same key (NULLs when no prior right
    row exists) — the classic as-of/backward join.

    Implementation: tag both sides, union, and per key take
    ``last(payload, ignorenulls)`` over an ordered window ending at the
    current row; right rows sort BEFORE left rows at equal timestamps, so
    a same-instant right row is visible (>= semantics, matching ANSI/
    DuckDB ASOF). Right side should be unique per (key, ts) — pre-
    aggregate if not — or the latest-by-sort-order duplicate wins.
    """
    l_tag = left.withColumn("_side", F.lit(1))
    for c in payload_cols:
        l_tag = l_tag.withColumn(f"{c}{suffix}",
                                 F.lit(None).cast(right.schema[c].dataType))
    r_tag = right.select(
        F.col(key), F.col(ts),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload_cols]) \
        .withColumn("_side", F.lit(0))
    for f in left.schema.fields:
        if f.name not in (key, ts):
            r_tag = r_tag.withColumn(f.name,
                                     F.lit(None).cast(f.dataType))
    combined = l_tag.unionByName(r_tag)
    wnd = (Window.partitionBy(key).orderBy(F.col(ts), F.col("_side"))
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for c in payload_cols:
        combined = combined.withColumn(
            f"{c}{suffix}",
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(wnd))
    return combined.filter(F.col("_side") == 1).drop("_side")


def sessionize(df: DataFrame, key: str = "user_id", ts: str = "ts",
               gap_seconds: int = 1800) -> DataFrame:
    """Assign inactivity-gap sessions per key: a new session starts when
    the gap to the previous event exceeds ``gap_seconds``. Adds
    ``session_idx`` (0-based per key, by event time) — lag + cumulative
    sum of session-start flags, the standard relational sessionization.

    Scale: one shuffle on the key; the two windows share the same
    partitioning/ordering so Catalyst evaluates them in one Window node.
    (Streaming twin: ``F.session_window`` in streaming.windowed_counts'
    style — this is the batch/backfill form.)"""
    w = Window.partitionBy(key).orderBy(ts)
    prev = F.lag(F.col(ts)).over(w)
    new_sess = F.when(
        prev.isNull()
        | ((F.unix_timestamp(F.col(ts)) - F.unix_timestamp(prev))
           > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_idx",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - 1)


def range_join(left: DataFrame, intervals: DataFrame, key: str,
               point: str = "ts", start: str = "start", end: str = "end",
               bucket_width: int = 3600) -> DataFrame:
    """Join point rows to interval rows with
    ``start <= point < end`` per key, WITHOUT a cartesian/theta join: both
    sides bucket by ``floor(epoch/width)`` (intervals explode into every
    bucket they cover), the join is an equi-join on (key, bucket), and the
    range predicate filters the small per-bucket candidate set.
    """
    ep = F.unix_timestamp
    lb = left.withColumn("_bkt", F.floor(ep(F.col(point)) / bucket_width))
    # cover through floor(end/width) INCLUSIVE: unix_timestamp truncates
    # sub-second parts, so an exclusive-end "end-1" bucket bound could
    # miss a point in the end's bucket; an extra candidate bucket is
    # harmless (the range predicate filters it), a missed one is a wrong
    # answer
    iv = intervals.withColumn(
        "_bkt",
        F.explode(F.sequence(
            F.floor(ep(F.col(start)) / bucket_width),
            F.floor(ep(F.col(end)) / bucket_width))))
    joined = lb.join(iv, [key, "_bkt"])
    return (joined.filter((F.col(start) <= F.col(point))
                          & (F.col(point) < F.col(end)))
            .drop("_bkt"))
