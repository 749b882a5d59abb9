"""WARC/1.0 container source — Common Crawl's wire format.

Clean-room implementation from PUBLIC specifications only:

* ISO 28500 / the IIPC WARC-1.0 spec (record grammar: version line,
  named headers, ``Content-Length`` block framing, CRLF CRLF record
  separator);
* RFC 9112 (HTTP/1.1 message framing; §7.1 chunked transfer coding);
* RFC 1952 (gzip; multi-member streams — Common Crawl stores ONE gzip
  member PER RECORD so byte-range readers can seek to a record without
  decompressing the whole file).

The reference pipeline (tuatara.cpp:12-36) consumes pre-extracted page
images from a directory; at crawl scale the pages arrive inside WARC
containers, so this module is the missing ingest edge: it maps
``*.warc(.gz)`` files to the canonical ``(url, warc_ts, html)`` page
table every other operator in this repo consumes (BASELINE.json
input_hint).

Scale notes (100 TB): Common Crawl ships ~1 GB .warc.gz files; one
Spark task per file is the natural unit (the whole-file gzip stream is
inherently sequential), so parallelism = file count — a 100 TB crawl is
~100k files, far above any executor count. ``read_warc`` reads files
via the ``binaryFile`` source and parses in an Arrow-batched
``mapInPandas``; record rows stream out with only (url, ts, headers,
body) — the container wrapper never crosses a shuffle. Malformed
records become ERROR ROWS, never failed tasks: one corrupt record in a
trillion-row crawl must not kill a stage, and the parser RESYNCS to the
next ``WARC/1.0`` magic so a single bad Content-Length does not eat the
rest of the file.
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator

CRLF = b"\r\n"
_MAGIC = b"WARC/1.0" + CRLF
_GZ_MAGIC = b"\x1f\x8b"


# ---------------------------------------------------------------------------
# Writer (fixture/egress side)
# ---------------------------------------------------------------------------

def _record(rtype: str, headers: dict[str, str], block: bytes) -> bytes:
    """One WARC record: version line, headers, blank line, block, and the
    two CRLFs that terminate every record (WARC-1.0 §4)."""
    lines = [b"WARC/1.0"]
    merged = {"WARC-Type": rtype, **headers,
              "Content-Length": str(len(block))}
    for k, v in merged.items():
        lines.append(f"{k}: {v}".encode())
    return CRLF.join(lines) + CRLF + CRLF + block + CRLF + CRLF


def http_response(status: int, reason: str, headers: dict[str, str],
                  body: bytes, *, chunked: bool = False,
                  gzip_body: bool = False) -> bytes:
    """Serialize an HTTP/1.1 response block (the payload of a WARC
    ``response`` record). ``chunked`` applies RFC 9112 §7.1 transfer
    coding; ``gzip_body`` applies Content-Encoding: gzip (mtime pinned to
    0 so output is deterministic)."""
    hdrs = dict(headers)
    if gzip_body:
        body = gzip.compress(body, mtime=0)
        hdrs["Content-Encoding"] = "gzip"
    if chunked:
        hdrs["Transfer-Encoding"] = "chunked"
        out = b""
        # split into two chunks when possible so multi-chunk parsing is
        # actually exercised, not just the 1-chunk degenerate case
        cut = max(1, len(body) // 2) if body else 0
        for piece in ([body[:cut], body[cut:]] if body else []):
            if piece:
                out += f"{len(piece):x}".encode() + CRLF + piece + CRLF
        body = out + b"0" + CRLF + CRLF
    else:
        hdrs["Content-Length"] = str(len(body))
    head = [f"HTTP/1.1 {status} {reason}".encode()]
    for k, v in hdrs.items():
        head.append(f"{k}: {v}".encode())
    return CRLF.join(head) + CRLF + CRLF + body


def encode_warc(pages: list[dict], *, per_record_gzip: bool = True) -> bytes:
    """Serialize pages as a .warc(.gz) byte stream.

    Each page dict: ``url``, ``date`` (ISO-8601 ``...Z``), ``status``,
    ``content_type``, ``body`` (bytes), optional ``chunked`` /
    ``gzip_body`` booleans. Emits the realistic record mix — a leading
    ``warcinfo``, then per page a ``request`` + ``response`` +
    ``metadata`` triple — so readers must FILTER BY WARC-Type rather
    than assume response-only files. ``per_record_gzip=True`` emits one
    gzip member per record (Common Crawl layout); ``False`` emits the
    uncompressed concatenation."""
    records: list[bytes] = []
    info = b"software: tuatara-spark-fixture/1.0" + CRLF
    records.append(_record("warcinfo", {
        "WARC-Date": pages[0]["date"] if pages else "2026-01-01T00:00:00Z",
        "Content-Type": "application/warc-fields",
    }, info))
    for p in pages:
        req = (f"GET {p['url']} HTTP/1.1".encode() + CRLF
               + b"Host: example.org" + CRLF + CRLF)
        records.append(_record("request", {
            "WARC-Target-URI": p["url"], "WARC-Date": p["date"],
            "Content-Type": "application/http; msgtype=request",
        }, req))
        block = http_response(
            p["status"], p.get("reason", "OK"),
            {"Content-Type": p["content_type"]}, p["body"],
            chunked=p.get("chunked", False),
            gzip_body=p.get("gzip_body", False))
        records.append(_record("response", {
            "WARC-Target-URI": p["url"], "WARC-Date": p["date"],
            "Content-Type": "application/http; msgtype=response",
        }, block))
        records.append(_record("metadata", {
            "WARC-Target-URI": p["url"], "WARC-Date": p["date"],
            "Content-Type": "application/warc-fields",
        }, b"fetchTimeMs: 7" + CRLF))
    if per_record_gzip:
        return b"".join(gzip.compress(r, mtime=0) for r in records)
    return b"".join(records)


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------

_GZ_CHUNK = 1 << 20


def split_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a multi-member gzip stream, yielding one bytes object
    per member (RFC 1952 allows arbitrary concatenation; stdlib
    ``gzip.decompress`` would flatten the boundaries we need).

    Feeds the decompressor GROWING ``memoryview`` slices (zero-copy)
    instead of ``data[pos:]`` per member: Common Crawl stores ONE member
    per record, so a whole-tail slice — and the ``unused_data`` copy it
    produces — per member would be O(n × members) memcpy on a ~1 GB
    .warc.gz with tens of thousands of records. Chunks start at 4 KiB
    (≈ one small record, so the post-``eof`` ``unused_data`` copy stays
    member-sized) and double up to 1 MiB within a member, keeping both
    the feed cost and the tail copy O(member size) — measured: the
    round-3 whole-tail version AND a fixed-1 MiB-chunk variant were
    each superlinear on multi-MB many-member files; this one is flat."""
    mv = memoryview(data)
    n = len(mv)
    pos = 0
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        start = pos
        parts = []
        step = 4096
        while pos < n and not d.eof:
            chunk = mv[pos:pos + step]
            parts.append(d.decompress(chunk))
            pos += len(chunk)
            step = min(step * 2, _GZ_CHUNK)
        if d.eof:
            # back up over the tail of the last chunk that belongs to
            # the NEXT member (unused_data is ≤ one chunk, never the
            # whole remaining buffer)
            pos -= len(d.unused_data)
        parts.append(d.flush())
        yield b"".join(parts)
        if pos <= start:  # no forward progress — corrupt tail
            raise ValueError("gzip member made no progress")


def _decompress(data: bytes) -> bytes:
    if data[:2] == _GZ_MAGIC:
        return b"".join(split_gzip_members(data))
    return data


def _parse_headers(text: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in text.split(CRLF):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.decode("latin-1").strip().lower()] = \
                v.decode("latin-1").strip()
    return headers


def iter_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes, str]]:
    """Yield ``(warc_headers, block, error)`` per record from an
    UNCOMPRESSED WARC stream. Framing is by ``Content-Length``; on a
    broken frame the parser emits an error tuple and RESYNCS by scanning
    for the next ``WARC/1.0`` version line."""
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(_MAGIC, pos)
        if start < 0:
            if data[pos:].strip():
                yield {}, b"", "trailing bytes with no WARC/1.0 magic"
            return
        if start > pos and data[pos:start].strip():
            yield {}, b"", "unframed bytes before next record"
        head_end = data.find(CRLF + CRLF, start)
        if head_end < 0:
            yield {}, b"", "unterminated record header"
            return
        headers = _parse_headers(data[start + len(_MAGIC):head_end])
        try:
            length = int(headers["content-length"])
            if length < 0 or head_end + 4 + length > n:
                raise ValueError
        except (KeyError, ValueError):
            yield headers, b"", "bad or missing Content-Length"
            pos = start + len(_MAGIC)  # resync after this magic
            continue
        block_start = head_end + 4
        yield headers, data[block_start:block_start + length], ""
        pos = block_start + length


def _dechunk(body: bytes) -> bytes:
    """RFC 9112 §7.1 chunked transfer decoding."""
    out = []
    pos = 0
    while True:
        eol = body.find(CRLF, pos)
        if eol < 0:
            raise ValueError("chunked body: missing size line")
        size_token = body[pos:eol].split(b";")[0].strip()
        size = int(size_token, 16)
        pos = eol + 2
        if size == 0:
            break
        if pos + size > len(body):
            raise ValueError("chunked body: truncated chunk")
        out.append(body[pos:pos + size])
        pos += size + 2  # skip chunk-data CRLF
    return b"".join(out)


def parse_http_response(block: bytes) -> tuple[int, dict[str, str], bytes]:
    """Parse an HTTP/1.1 response block into (status, headers, body),
    undoing chunked transfer coding and gzip content coding."""
    head_end = block.find(CRLF + CRLF)
    if head_end < 0:
        raise ValueError("http block: no header terminator")
    head = block[:head_end].split(CRLF)
    status_line = head[0].split(None, 2)
    if len(status_line) < 2 or not status_line[0].startswith(b"HTTP/"):
        raise ValueError("http block: bad status line")
    status = int(status_line[1])
    headers = _parse_headers(CRLF.join(head[1:]))
    body = block[head_end + 4:]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    if headers.get("content-encoding", "").lower() == "gzip":
        body = gzip.decompress(body)
    return status, headers, body


def warc_rows(data: bytes, source: str = "",
              record_types: tuple = ("response",)) -> list[dict]:
    """All records of the requested WARC-Types in one container as flat
    row dicts (``response`` blocks get the HTTP parse; ``conversion`` —
    WET — and other types carry the raw block as ``html``). Corrupt
    records/blocks become rows with ``error`` set — the Spark task never
    fails on bad input bytes."""
    rows: list[dict] = []
    try:
        stream = _decompress(data)
    except Exception as e:  # corrupt gzip container
        return [{"source": source, "url": "", "warc_ts": "", "status": 0,
                 "content_type": "", "html": b"",
                 "error": f"container: {e}"}]
    for headers, block, err in iter_records(stream):
        if err:
            rows.append({"source": source, "url": headers.get(
                "warc-target-uri", ""), "warc_ts": headers.get(
                "warc-date", ""), "status": 0, "content_type": "",
                "html": b"", "error": err})
            continue
        rtype = headers.get("warc-type")
        if rtype not in record_types:
            continue  # request/metadata/warcinfo records
        row = {"source": source,
               "url": headers.get("warc-target-uri", ""),
               "warc_ts": headers.get("warc-date", ""),
               "status": 0, "content_type": "", "html": b"", "error": ""}
        if rtype == "response":
            try:
                status, http_headers, body = parse_http_response(block)
                row.update(status=status, html=body,
                           content_type=http_headers.get("content-type",
                                                         ""))
            except Exception as e:
                row["error"] = f"http: {e}"
        else:
            row.update(html=block,
                       content_type=headers.get("content-type", ""))
        rows.append(row)
    return rows


WARC_SCHEMA = ("source string, url string, warc_ts string, status int, "
               "content_type string, html binary, error string")


def parse_batches_fn(record_types: tuple = ("response",),
                     source_col: str = "path",
                     content_col: str = "content"):
    """Arrow-batched mapInPandas parser over (source, content) rows —
    the ONE implementation behind the batch reader, the streaming
    reader, and the query-synthesized containers (emit WARC_SCHEMA)."""
    import pandas as pd

    cols = ["source", "url", "warc_ts", "status", "content_type",
            "html", "error"]

    def parse(batches):
        for pdf in batches:
            out: list[dict] = []
            for p, c in zip(pdf[source_col], pdf[content_col]):
                out.extend(warc_rows(bytes(c), source=str(p),
                                     record_types=record_types))
            yield pd.DataFrame(out, columns=cols)

    return parse


def read_warc(spark, path: str, record_types: tuple = ("response",)):
    """``*.warc(.gz)`` files → DataFrame(source, url, warc_ts, status,
    content_type, html, error) — the canonical page table.

    One ``binaryFile`` row per file (CC-sized ~1 GB units), parsed in an
    Arrow-batched ``mapInPandas``; downstream repartition() spreads
    records when per-file row counts are skewed."""
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")
    return files.mapInPandas(parse_batches_fn(record_types), WARC_SCHEMA)


# ---------------------------------------------------------------------------
# WET egress (extracted-text conversion records)
# ---------------------------------------------------------------------------

def encode_wet(pages: list[dict], *, per_record_gzip: bool = True) -> bytes:
    """Serialize extracted text as a WET stream: ``conversion`` records
    with ``Content-Type: text/plain`` (the Common Crawl WET layout),
    preceded by a warcinfo. Each page dict: ``url``, ``date``, ``text``."""
    records = [_record("warcinfo", {
        "WARC-Date": pages[0]["date"] if pages else "2026-01-01T00:00:00Z",
        "Content-Type": "application/warc-fields",
    }, b"software: tuatara-spark/1.0" + CRLF)]
    for p in pages:
        records.append(_record("conversion", {
            "WARC-Target-URI": p["url"], "WARC-Date": p["date"],
            "Content-Type": "text/plain",
        }, p["text"].encode("utf-8")))
    if per_record_gzip:
        return b"".join(gzip.compress(r, mtime=0) for r in records)
    return b"".join(records)


def _write_records(df, path: str, suffix: str, encode_fn, row_iter):
    """Shared per-partition record sink (WET/WAT): each task serializes
    its rows via ``encode_fn`` into one ``part-{pid}{suffix}`` under
    ``path`` — tmp files are task-ATTEMPT-unique so a speculative or
    zombie duplicate attempt can never interleave into the same tmp and
    rename a corrupt blob (whichever attempt renames last wins with a
    complete file) — and emits a manifest row. On a cluster ``path`` is
    shared storage; executors write independently, no driver funnel.
    Returns the small manifest DataFrame (file, n_records, n_bytes).

    Any ``part-*{suffix}`` (or orphaned ``.tmp.*``) files already in
    ``path`` are removed up front, driver-side: a re-run with fewer or
    differently-numbered partitions would otherwise leave stale parts
    from the previous run that :func:`read_warc` happily unions into the
    output. Callers that need versioned output should put a run id in
    ``path`` (as the catalog writer does)."""
    import glob
    import os

    import pandas as pd

    os.makedirs(path, exist_ok=True)
    for stale in glob.glob(os.path.join(path, f"part-*{suffix}")):
        os.remove(stale)
    for stale in glob.glob(os.path.join(path, f"part-*{suffix}.tmp.*")):
        os.remove(stale)

    def sink(batches):
        from pyspark import TaskContext
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        attempt = ctx.taskAttemptId()
        entries = []
        for pdf in batches:
            entries.extend(row_iter(pdf))
        fname = os.path.join(path, f"part-{pid:05d}{suffix}")
        if entries:
            blob = encode_fn(entries)
            tmp = f"{fname}.tmp.{attempt}"
            with open(tmp, "wb") as fh:
                fh.write(blob)
            os.rename(tmp, fname)
            yield pd.DataFrame({"file": [fname],
                                "n_records": [len(entries)],
                                "n_bytes": [len(blob)]})

    return df.mapInPandas(sink, "file string, n_records long, n_bytes long")


def write_wet(df, path: str, url_col: str = "url", text_col: str = "text",
              date: str = "2026-01-01T00:00:00Z"):
    """Distributed WET sink: extracted text out as conversion records,
    one ``part-{pid}.warc.gz`` per partition (see :func:`_write_records`
    for the commit shape)."""
    def rows(pdf):
        return [{"url": u, "date": date, "text": t or ""}
                for u, t in zip(pdf[url_col], pdf[text_col])]

    return _write_records(df.select(url_col, text_col), path, ".warc.gz",
                          encode_wet, rows)


def encode_wat(entries: list[dict], *, per_record_gzip: bool = True) -> bytes:
    """Serialize crawl metadata as a WAT stream: ``metadata`` records
    with a deterministic compact-JSON payload per page (sorted keys, no
    whitespace — byte-reproducible across writers). Each entry dict:
    ``url``, ``date``, and a ``meta`` dict of JSON-scalar fields."""
    import json

    records = [_record("warcinfo", {
        "WARC-Date": entries[0]["date"] if entries else
        "2026-01-01T00:00:00Z",
        "Content-Type": "application/warc-fields",
    }, b"software: tuatara-spark/1.0" + CRLF)]
    for e in entries:
        payload = json.dumps(e["meta"], sort_keys=True,
                             separators=(",", ":")).encode("utf-8")
        records.append(_record("metadata", {
            "WARC-Target-URI": e["url"], "WARC-Date": e["date"],
            "Content-Type": "application/json",
        }, payload))
    if per_record_gzip:
        return b"".join(gzip.compress(r, mtime=0) for r in records)
    return b"".join(records)


def write_wat(df, path: str, url_col: str = "url",
              meta_cols: tuple = ("warc_ts", "status", "content_type",
                                  "n_bytes"),
              date: str = "2026-01-01T00:00:00Z"):
    """Distributed WAT sink: per-page metadata out as metadata records
    whose compact sorted-key JSON carries ``meta_cols`` (same commit
    shape as :func:`write_wet` via :func:`_write_records`)."""
    cols = list(meta_cols)

    def rows(pdf):
        out = []
        for vals in zip(pdf[url_col], *(pdf[c] for c in cols)):
            meta = {c: (v.item() if hasattr(v, "item") else v)
                    for c, v in zip(cols, vals[1:])}
            out.append({"url": vals[0], "date": date, "meta": meta})
        return out

    return _write_records(df.select(url_col, *cols), path, ".wat.warc.gz",
                          encode_wat, rows)


# ---------------------------------------------------------------------------
# Revisit records (digest-based capture dedup)
# ---------------------------------------------------------------------------

def revisit_records(df, url_col: str = "url", ts_col: str = "warc_ts",
                    payload_col: str = "html"):
    """WARC 1.1 §6.7.2 ``identical-payload-digest`` revisit detection
    (ISO 28500; the dedup web archives run at ingest so a re-crawled
    unchanged page stores a tiny revisit record instead of the payload
    again): the FIRST capture of each payload digest — earliest
    ``ts_col``, ties by ``url_col`` — stays a ``response`` record;
    every later identical-payload capture becomes a ``revisit`` record
    carrying ``refers_to_url`` / ``refers_to_ts`` of the original.

    → (url, ts, payload_digest, record_type, refers_to_url,
    refers_to_ts), one row per input capture; refers_to_* are NULL on
    originals.

    Scale shape (100 TB): the digest is computed in-row (sha256,
    codegen); the only shuffle is a map-side-combinable
    ``groupBy(digest).min(struct(ts, url))`` whose output — one row per
    DISTINCT payload — joins back on the digest. Payload bytes never
    move: the join carries (digest, first-capture key) only, and AQE
    broadcasts the firsts side whenever the distinct-digest table fits.
    """
    from pyspark.sql import functions as F
    d = df.select(
        F.col(url_col).alias("url"), F.col(ts_col).alias("ts"),
        F.sha2(F.col(payload_col).cast("binary"), 256)
        .alias("payload_digest"))
    firsts = (d.groupBy("payload_digest")
              .agg(F.min(F.struct("ts", "url")).alias("_first")))
    is_orig = ((F.col("ts") == F.col("_first.ts"))
               & (F.col("url") == F.col("_first.url")))
    return (d.join(firsts, "payload_digest")
            .select(
                "url", "ts", "payload_digest",
                F.when(is_orig, F.lit("response"))
                .otherwise(F.lit("revisit")).alias("record_type"),
                F.when(~is_orig, F.col("_first.url"))
                .alias("refers_to_url"),
                F.when(~is_orig, F.col("_first.ts"))
                .alias("refers_to_ts")))
