"""Crawl-frontier scheduling: politeness-aware fetch ordering.

Reference parity: jackvial/tuatara has no crawler (README.md:1-15); this
completes the crawl lifecycle around the WARC source — schedule → fetch
→ parse (sources/warc.py) → index (sources/cdx.py) → rank
(ops/linkgraph.py). Clean-room from the public politeness conventions
(RFC 9309's crawl-delay extension and the one-connection-per-host rule
every major crawler documents).

Semantics: within a host, URLs fetch in (priority DESC, url ASC) order
— deterministic, resumable — at ``delay_ms`` spacing, so URL k's
offset is (k−1)·delay_ms. Hosts are assigned to ``n_slots`` worker
slots by an md5-derived hash (engine-portable, seedable via ``salt``),
so one host's fetches land on ONE slot — politeness needs a single
serializing owner per host, and hashing gives it without coordination.

Scale notes: the per-host rank is a window over the host partition.
That is a per-host SORT, which is exactly the work the problem
requires — a host's queue is sequential by definition (the crawler
fetches it one URL at a time), so a mega-host means a long QUEUE, not
a parallelizable workload; the slot hash spreads distinct hosts evenly
across workers, which is where the real parallelism lives. No
cross-host state, no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def schedule(urls: DataFrame, host_col: str = "host",
             url_col: str = "url", priority_col: str | None = None,
             delay_ms: int = 1000, n_slots: int = 32,
             salt: str = "s1") -> DataFrame:
    """(host, url, fetch_rank, fetch_offset_ms, slot): the politeness
    schedule (see module docstring). ``priority_col`` orders within a
    host (higher first); omitted → pure url order."""
    order = ([F.col(priority_col).desc()] if priority_col else []) + \
        [F.col(url_col).asc()]
    w = Window.partitionBy(host_col).orderBy(*order)
    rank = F.row_number().over(w)
    slot = (F.conv(F.substring(F.md5(
        F.concat(F.col(host_col), F.lit(salt))), 1, 8), 16, 10)
        .cast("long") % n_slots).cast("int")
    return urls.select(
        F.col(host_col).alias("host"), F.col(url_col).alias("url"),
        rank.alias("fetch_rank"),
        ((rank - 1) * delay_ms).cast("long").alias("fetch_offset_ms"),
        slot.alias("slot"))
