"""The extraction job: spark-submit entry point with resume + lineage.

Flow (one run):
  read pages → url-hash bucket + skew salt → drop already-committed buckets
  (resume from last snapshot) → explicit (bucket, salt) shuffle → Arrow-UDF
  extraction → write parquet hive-partitioned by bucket → aggregate
  per-bucket counters → commit snapshot + manifests.

Buckets are processed in ``groups`` micro-batches, one snapshot each, so a
mid-job failure loses at most one group and the next invocation resumes
from the last committed snapshot (north_rule). ``fail_after_groups`` is a
test hook that simulates the crash.

Usage:
  spark-submit --py-files tuatara_spark.zip -m tuatara_spark.job \
      --input pages.parquet --output /table/root
"""

from __future__ import annotations

import argparse
import glob
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from tuatara_spark import engine, partitioning as pt
from tuatara_spark import weights as wt
from tuatara_spark.catalog import Catalog


class InjectedFailure(RuntimeError):
    """Raised by the fail_after_groups test hook."""


def _bucket_counters(out_df: DataFrame) -> dict[int, dict]:
    rows = (out_df.groupBy("part_id")
            .agg(F.count("*").alias("pages"),
                 F.sum("n_regions").alias("regions"),
                 F.sum("n_chars").alias("chars"),
                 F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0))
                 .alias("failures"))
            .collect())
    return {int(r.part_id): {"pages": int(r.pages),
                             "regions": int(r.regions or 0),
                             "chars": int(r.chars or 0),
                             "failures": int(r.failures or 0)}
            for r in rows}


def run_extract(spark: SparkSession, input_path: str, output_root: str,
                num_buckets: int = pt.DEFAULT_NUM_BUCKETS,
                groups: int = 1,
                num_tasks: int | None = None,
                heavy_bytes: int = pt.DEFAULT_HEAVY_BYTES,
                weights_seed: int = 42,
                fail_after_groups: int | None = None) -> dict:
    """Run (or resume) the extraction job. Returns a summary dict."""
    cat = Catalog(output_root)
    # fail fast if this invocation would reinterpret committed bucket ids
    # (different num_buckets) or produce divergent text (different weights)
    cat.pin_table_config(num_buckets=int(num_buckets),
                         weights_seed=int(weights_seed))
    done = cat.committed_buckets()
    if num_tasks is None:
        num_tasks = spark.sparkContext.defaultParallelism * 2

    pages = spark.read.parquet(input_path)
    pages = pt.with_bucket(pages, num_buckets)
    remaining = sorted(set(range(num_buckets)) - done)
    if not remaining:
        return {"resumed": True, "groups_run": 0, "buckets": [],
                "totals": cat.totals()}

    w = wt.build_weights(weights_seed)
    group_size = max(1, -(-len(remaining) // groups))
    chunks = [remaining[i:i + group_size]
              for i in range(0, len(remaining), group_size)]

    groups_run = 0
    all_buckets: list[int] = []
    for chunk in chunks:
        sid, run_dir = cat.new_run()
        sub = pages.filter(F.col("part_id").isin([int(b) for b in chunk]))
        sub = pt.with_salt(sub, heavy_bytes=heavy_bytes)
        sub = pt.distribute(sub, num_tasks)
        out = engine.extract_df(sub.drop("salt"), weights=w)
        (out.write.mode("overwrite").partitionBy("part_id").parquet(run_dir))
        # counters from the data just written (no recompute of the UDF);
        # a group whose buckets held no rows writes no parquet files
        has_files = bool(glob.glob(os.path.join(run_dir, "**", "*.parquet"),
                                   recursive=True))
        if has_files:
            written = spark.read.parquet(run_dir)
            counters = _bucket_counters(written)
        else:
            counters = {}
        totals = {
            "pages": sum(c["pages"] for c in counters.values()),
            "regions": sum(c["regions"] for c in counters.values()),
            "chars": sum(c["chars"] for c in counters.values()),
            "failures": sum(c["failures"] for c in counters.values()),
        }
        # buckets with zero rows still count as committed (processed-empty)
        cat.commit(sid, [int(b) for b in chunk], counters, totals)
        groups_run += 1
        all_buckets.extend(chunk)
        if fail_after_groups is not None and groups_run >= fail_after_groups:
            raise InjectedFailure(f"injected failure after {groups_run} groups")
    return {"resumed": bool(done), "groups_run": groups_run,
            "buckets": all_buckets, "totals": cat.totals()}


def _crawl_counters(out_df: DataFrame) -> dict[int, dict]:
    rows = (out_df.groupBy("part_id")
            .agg(F.count("*").alias("pages"),
                 F.sum(F.length("main_text")).alias("chars"),
                 F.sum(F.when(F.length("main_text") == 0, 1).otherwise(0))
                 .alias("empties"))
            .collect())
    return {int(r.part_id): {"pages": int(r.pages),
                             "chars": int(r.chars or 0),
                             "empties": int(r.empties or 0)}
            for r in rows}


def run_crawl(spark: SparkSession, input_dir: str, output_root: str,
              num_buckets: int = pt.DEFAULT_NUM_BUCKETS,
              groups: int = 1, num_tasks: int | None = None,
              fail_after_groups: int | None = None,
              refresh: bool = False) -> dict:
    """The HTML half of the north_rule under the SAME commit/resume
    protocol as the OCR job: WARC containers → parse → charset
    sniff+decode → boilerplate strip → url-hash buckets → per-group
    snapshot commits with per-bucket lineage counters. A crash loses at
    most one group; the next invocation resumes from the last committed
    snapshot and reprocesses only uncommitted buckets.

    Note the resume unit is the url-hash BUCKET, not the container file:
    a container's records scatter across buckets, so a resumed run
    re-reads the input files but re-extracts only missing buckets —
    at crawl scale the re-read is the cheap half (columnar-pruned scan /
    container parse) and the commit math stays a pure function of url."""
    from tuatara_spark.ops import encoding, htmlx
    from tuatara_spark.sources import warc as W
    cat = Catalog(output_root)
    cat.pin_table_config(num_buckets=int(num_buckets), pipeline="crawl")
    # refresh = an UPSERT run over a re-crawl drop: start a new refresh
    # GENERATION and process every bucket again; readers resolve per-url
    # latest via Catalog.read_latest (merge-on-read). Resume is
    # generation-scoped: a crash mid-refresh leaves the current
    # generation partially committed, and the next refresh=False
    # invocation resumes THAT generation's missing buckets (the original
    # crawl's commits must not mask them).
    cur_gen = cat.current_gen()
    gen = cur_gen + 1 if refresh else cur_gen
    done = set() if refresh else cat.committed_buckets(gen=gen)
    if num_tasks is None:
        num_tasks = spark.sparkContext.defaultParallelism * 2

    recs = W.read_warc(spark, input_dir).where(F.col("error") == "")
    decoded = encoding.sniff_decode(recs)
    stripped = htmlx.strip_boilerplate(decoded, col="text")
    pages = pt.with_bucket(stripped, num_buckets)
    remaining = sorted(set(range(num_buckets)) - done)
    if not remaining:
        return {"resumed": True, "groups_run": 0, "buckets": [],
                "totals": cat.totals()}
    if len(remaining) > 1 and groups > 1:
        # the per-group bucket filter cannot push below the Python parse,
        # so without this every group would re-gunzip and re-parse EVERY
        # container — the dominant cost. Parse once, spill-tolerant.
        from pyspark import StorageLevel
        pages = pages.persist(StorageLevel.MEMORY_AND_DISK)

    group_size = max(1, -(-len(remaining) // groups))
    chunks = [remaining[i:i + group_size]
              for i in range(0, len(remaining), group_size)]
    groups_run = 0
    all_buckets: list[int] = []
    for chunk in chunks:
        sid, run_dir = cat.new_run()
        sub = (pages.filter(F.col("part_id")
                            .isin([int(b) for b in chunk]))
               .select("url", "warc_ts", "charset", "main_text", "part_id"))
        # text rows are uniformly small — repartition on part_id alone
        # (the OCR job's payload salting is for MB-scale page images)
        sub = sub.repartition(num_tasks, F.col("part_id"))
        sub.write.mode("overwrite").partitionBy("part_id").parquet(run_dir)
        has_files = bool(glob.glob(os.path.join(run_dir, "**", "*.parquet"),
                                   recursive=True))
        counters = (_crawl_counters(spark.read.parquet(run_dir))
                    if has_files else {})
        totals = {"pages": sum(c["pages"] for c in counters.values()),
                  "chars": sum(c["chars"] for c in counters.values()),
                  "empties": sum(c["empties"] for c in counters.values())}
        cat.commit(sid, [int(b) for b in chunk], counters, totals,
                   extra={"gen": gen})
        groups_run += 1
        all_buckets.extend(chunk)
        if fail_after_groups is not None and groups_run >= fail_after_groups:
            raise InjectedFailure(
                f"injected failure after {groups_run} groups")
    pages.unpersist()
    return {"resumed": bool(done), "groups_run": groups_run, "gen": gen,
            "buckets": all_buckets, "totals": cat.totals()}


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="tuatara_spark extraction job")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--num-buckets", type=int, default=pt.DEFAULT_NUM_BUCKETS)
    p.add_argument("--groups", type=int, default=4)
    p.add_argument("--num-tasks", type=int, default=None)
    p.add_argument("--heavy-bytes", type=int, default=pt.DEFAULT_HEAVY_BYTES)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--local-cores", default=None,
                   help="run standalone on local[N] instead of relying on "
                        "spark-submit's master")
    args = p.parse_args(argv)
    if args.local_cores:
        from tuatara_spark.session import get_spark
        spark = get_spark("tuatara-extract", cores=args.local_cores)
    else:
        spark = SparkSession.builder.appName("tuatara-extract").getOrCreate()
    summary = run_extract(spark, args.input, args.output,
                          num_buckets=args.num_buckets, groups=args.groups,
                          num_tasks=args.num_tasks,
                          heavy_bytes=args.heavy_bytes,
                          weights_seed=args.seed)
    print(summary)


if __name__ == "__main__":
    main()
