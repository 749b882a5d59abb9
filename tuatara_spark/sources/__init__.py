"""Container/source readers beyond bare parquet.

``warc`` — the WARC/1.0 web-archive container (Common Crawl's wire
format): per-member-gzip record splitting, HTTP/1.1 response parsing
(chunked transfer coding, gzip content coding), and a Spark reader that
turns ``*.warc`` / ``*.warc.gz`` files into the engine's canonical
``(url, warc_ts, html, ...)`` page table.
"""
