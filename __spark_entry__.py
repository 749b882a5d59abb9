"""Driver contract for the spark-graft builder (PySpark target).

Delegates to tuatara_spark.queries — one entry per implemented operator
(SURVEY.md §2 pipeline-stage mirrors, the flagship end-to-end extraction
query, the crawl front end — WARC/WET/WAT, charset decode, robots — and
the training-data ops: dedup/similarity/text-analysis/multimodal/
streaming/sampling/packing). 129 of 132 queries carry an exact DuckDB
oracle —
including analytic first-principles oracles for the multimodal decode
queries and recall+precision gates for the approximate ANN/MinHash/SimHash
paths; only the xxhash64-based pair LISTS (minhash/simhash) and the
kmeans-centroid IVF top-k are rows-only, each pinned by pytest + a
driver-visible gate query (tests/test_ops.py, tests/test_entry_contract.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from tuatara_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: render TPAGE pages from sf0.001 documents and run
    the full detection→recognition→decode extraction pipeline on them."""
    return Q.q_ocr_extract_docs(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
