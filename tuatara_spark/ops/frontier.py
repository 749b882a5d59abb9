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


def parse_sitemaps(df: DataFrame, host_col: str = "host",
                   xml_col: str = "sitemap_xml") -> DataFrame:
    """Sitemap parsing (the public sitemaps.org 0.9 protocol) — the URL
    discovery feed for :func:`schedule`: one row per ``<url>`` entry
    with its ``loc`` (required), and optional ``lastmod``,
    ``changefreq`` and ``priority``. ``<sitemapindex>`` documents yield
    rows flagged ``is_index`` whose ``loc`` is a child sitemap URL to
    fetch, not a page.

    Pure Catalyst: the entry blocks come from one ``regexp_extract_all``
    over the document and each field from an anchored extract within
    its block — a shuffle-free projection at any scale. Deliberately a
    tag-scanner, not an XML parser (same trade the HTML ops make):
    malformed XML yields fewer rows, never a failed task. ``doc_pos``
    preserves document order."""
    entry_re = r"(?s)<(?:url|sitemap)\b[^>]*>(.*?)</(?:url|sitemap)>"
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(entry_re), 1)
    is_index = F.col(xml_col).rlike(r"(?s)<sitemapindex[\s>]")
    e = df.select(F.col(host_col).alias("host"), is_index.alias("is_index"),
                  F.posexplode(blocks).alias("doc_pos", "_b"))
    def field(tag: str):
        return F.regexp_extract(
            "_b", rf"(?s)<{tag}[^>]*>\s*(.*?)\s*</{tag}>", 1)
    return (e.select("host", "doc_pos", "is_index",
                     field("loc").alias("loc"),
                     field("lastmod").alias("lastmod"),
                     field("changefreq").alias("changefreq"),
                     field("priority").alias("priority"))
            .where(F.col("loc") != ""))
