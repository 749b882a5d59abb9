"""Structured Streaming ingestion for the extraction pipeline.

The reference is strictly batch (one image per call; SURVEY.md §2.2), and
the north_rule's "resumable from checkpoint" is satisfied by the batch
snapshot catalog (tuatara_spark.catalog). This module additionally exposes
the same Arrow-UDF engine as a Structured Streaming flow for continuous
crawl ingestion: new parquet files landing in a directory are extracted
incrementally with Spark's own checkpointing, exactly-once per file.

``mapInArrow`` is streaming-compatible (stateless per-batch transform), so
the one shared kernel serves batch, resume, and streaming without change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tuatara_spark import engine
from tuatara_spark import weights as wt
from tuatara_spark.fixtures import TPAGE_MAGIC  # noqa: F401 (doc pointer)

PAGES_DDL = ("url string, warc_ts timestamp, html binary, "
             "text string, lang string")


def read_page_stream(spark: SparkSession, input_dir: str,
                     max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream over a directory of pages parquet files."""
    return (spark.readStream.schema(PAGES_DDL)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_dir))


def extract_stream(pages: DataFrame, weights: dict | None = None,
                   seed: int = 42) -> DataFrame:
    """Streaming extraction: same engine, same output schema."""
    w = weights if weights is not None else wt.build_weights(seed)
    return engine.extract_df(pages, weights=w)


def start_to_parquet(extracted: DataFrame, output_dir: str,
                     checkpoint_dir: str, trigger_available_now: bool = True):
    """Write the extraction stream to parquet with checkpointed
    exactly-once file tracking. ``availableNow`` drains the backlog and
    stops — the streaming analogue of one batch-job run."""
    writer = (extracted.writeStream.format("parquet")
              .option("path", output_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
