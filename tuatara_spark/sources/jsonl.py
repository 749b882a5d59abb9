"""JSONL training-shard sink + reader — the de-facto LLM-training
export format (one compact JSON object per line, gzip-compressed
shards, a manifest of (file, n_records, n_bytes) rows). The last hop
of the pipeline: curated documents leave the engine as shards a
training loader consumes directly.

Clean-room from the public conventions (JSON Lines spec at
jsonlines.org; sorted-key compact separators for byte-reproducible
output; ``mtime=0`` gzip so identical content produces identical
bytes). Reference parity: jackvial/tuatara has no storage layer
(README.md:1-15); this extends the egress family (WET/WAT sinks,
sources/warc.py) with the training-side format.

Scale shape: identical to the WET sink — each task serializes its own
partition to one ``part-{pid}.jsonl.gz`` under shared storage
(tmp+rename, task-attempt-unique tmp names, stale-part cleanup) and
emits a manifest row; no driver funnel. Shard count = partition count,
so callers size shards with ``repartition(n, key)`` — deterministic
url-hash sharding keeps re-runs byte-identical. Reads parallelize one
task per shard (gzip is not splittable; shards are sized accordingly,
~100-500 MB each at production scale).
"""

from __future__ import annotations

import gzip
import json


def encode_jsonl(entries: list[dict]) -> bytes:
    """Serialize entries as gzip'd JSON Lines — sorted keys, compact
    separators, ``mtime=0``: byte-reproducible across writers."""
    lines = b"".join(
        json.dumps(e, sort_keys=True, separators=(",", ":"),
                   ensure_ascii=False).encode("utf-8") + b"\n"
        for e in entries)
    return gzip.compress(lines, mtime=0)


def write_jsonl_shards(df, path: str, cols: tuple | None = None):
    """Distributed JSONL sink: one ``part-{pid:05d}.jsonl.gz`` per
    partition of ``df`` (columns ``cols``, default all), committed via
    the shared tmp+rename protocol. Returns the manifest DataFrame."""
    from tuatara_spark.sources.warc import _write_records
    cols = list(cols or df.columns)

    def rows(pdf):
        out = []
        for vals in zip(*(pdf[c] for c in cols)):
            out.append({c: (v.item() if hasattr(v, "item") else v)
                        for c, v in zip(cols, vals)})
        return out

    return _write_records(df.select(*cols), path, ".jsonl.gz",
                          encode_jsonl, rows)


def read_jsonl_shards(spark, path: str, schema: str | None = None):
    """Read shards back — one task per shard (Spark's json source
    decompresses .gz natively). Pass ``schema`` for deterministic
    column types; otherwise Spark infers."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(f"{path}/part-*.jsonl.gz")
