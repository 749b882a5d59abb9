"""WARC/1.0 container source: round trips, record framing, HTTP codings,
resync on corruption, and the Spark binaryFile reader path."""

import gzip

import pytest

from tuatara_spark.sources import warc as W


def _pages(n=5):
    pages = []
    for i in range(n):
        pages.append({
            "url": f"https://example.org/p/{i}",
            "date": f"2026-01-01T0{i}:00:00Z",
            "status": 200 if i % 2 == 0 else 301,
            "reason": "OK" if i % 2 == 0 else "Moved Permanently",
            "content_type": "text/html",
            "body": f"<html><body>page {i} körper</body></html>".encode(),
            "chunked": i % 3 == 1,
            "gzip_body": i % 3 == 2,
        })
    return pages


@pytest.mark.parametrize("per_record_gzip", [True, False])
def test_round_trip(per_record_gzip):
    pages = _pages()
    blob = W.encode_warc(pages, per_record_gzip=per_record_gzip)
    rows = W.warc_rows(blob, source="f0")
    assert [r["error"] for r in rows] == [""] * len(pages)
    assert len(rows) == len(pages)  # warcinfo/request/metadata filtered
    for r, p in zip(rows, pages):
        assert r["url"] == p["url"]
        assert r["warc_ts"] == p["date"]
        assert r["status"] == p["status"]
        assert r["content_type"] == "text/html"
        assert r["html"] == p["body"]  # codings undone exactly


def test_gzip_member_split_is_per_record():
    pages = _pages(3)
    blob = W.encode_warc(pages, per_record_gzip=True)
    members = list(W.split_gzip_members(blob))
    # warcinfo + 3 × (request, response, metadata)
    assert len(members) == 1 + 3 * 3
    assert all(m.startswith(b"WARC/1.0\r\n") for m in members)


def test_chunked_decoding_multi_chunk():
    body = b"A" * 100 + b"B" * 100
    block = W.http_response(200, "OK", {"Content-Type": "text/plain"},
                            body, chunked=True)
    assert b"Transfer-Encoding: chunked" in block
    assert b"64\r\n" in block  # two 0x64-byte chunks
    status, headers, got = W.parse_http_response(block)
    assert (status, got) == (200, body)


def test_content_encoding_gzip():
    body = b"compress me " * 50
    block = W.http_response(200, "OK", {}, body, gzip_body=True)
    assert gzip.decompress(block.split(b"\r\n\r\n", 1)[1]) == body
    _, headers, got = W.parse_http_response(block)
    assert headers["content-encoding"] == "gzip"
    assert got == body


def test_resync_after_bad_content_length():
    pages = _pages(3)
    blob = W.encode_warc(pages, per_record_gzip=False)
    # corrupt the FIRST response record's Content-Length digits
    idx = blob.find(b"msgtype=response")
    cl = blob.find(b"Content-Length: ", idx)
    bad = blob[:cl + 16] + b"99999999" + blob[cl + 16:]
    rows = W.warc_rows(bad, source="f0")
    errors = [r for r in rows if r["error"]]
    ok = [r for r in rows if not r["error"]]
    assert errors, "corrupt frame must surface an error row"
    # later records survive the resync
    assert {r["url"] for r in ok} >= {pages[1]["url"], pages[2]["url"]}


def test_truncation_never_raises():
    blob = W.encode_warc(_pages(2), per_record_gzip=True)
    for cut in range(0, len(blob), max(1, len(blob) // 23)):
        rows = W.warc_rows(blob[:cut], source="t")  # must not raise
        assert isinstance(rows, list)
    # flipped bytes in the gzip stream must not raise either
    for pos in range(8, len(blob), max(1, len(blob) // 17)):
        mutated = bytearray(blob)
        mutated[pos] ^= 0xFF
        assert isinstance(W.warc_rows(bytes(mutated), source="m"), list)


def test_read_warc_spark(spark, tmp_path):
    pages = _pages(4)
    p1 = tmp_path / "a.warc.gz"
    p2 = tmp_path / "b.warc"
    p1.write_bytes(W.encode_warc(pages[:2], per_record_gzip=True))
    p2.write_bytes(W.encode_warc(pages[2:], per_record_gzip=False))
    df = W.read_warc(spark, str(tmp_path))
    rows = {r.url: r for r in df.collect()}
    assert set(rows) == {p["url"] for p in pages}
    for p in pages:
        r = rows[p["url"]]
        assert r.error == ""
        assert bytes(r.html) == p["body"]
        assert r.status == p["status"]
        assert r.source.endswith(("a.warc.gz", "b.warc"))


def test_wet_sink_round_trip(spark, tmp_path):
    import pandas as pd
    pdf = pd.DataFrame({"url": [f"https://e.org/{i}" for i in range(40)],
                        "text": [f"extracted text {i} — ünïcode" if i % 7
                                 else "" for i in range(40)]})
    df = spark.createDataFrame(pdf).repartition(4)
    wet_dir = str(tmp_path / "wet")
    manifest = W.write_wet(df, wet_dir).collect()
    assert sum(m.n_records for m in manifest) == 40
    assert all(m.file.endswith(".warc.gz") for m in manifest)
    assert len(manifest) <= 4                    # one file per partition
    # read back through the same reader, conversion records
    got = {r.url: bytes(r.html).decode("utf-8") for r in
           W.read_warc(spark, wet_dir, record_types=("conversion",))
           .collect()}
    want = dict(zip(pdf["url"], pdf["text"]))
    assert got == want                           # byte-exact text per url
    # and the default response-only read sees nothing in a WET file
    assert W.read_warc(spark, wet_dir).count() == 0


def test_wat_sink_round_trip(spark, tmp_path):
    import json
    import pandas as pd
    pdf = pd.DataFrame({"url": [f"https://e.org/{i}" for i in range(10)],
                        "warc_ts": ["2026-01-01T00:00:00Z"] * 10,
                        "status": [200 + i % 2 for i in range(10)],
                        "content_type": ["text/html"] * 10,
                        "n_bytes": [100 * i for i in range(10)]})
    df = spark.createDataFrame(pdf).repartition(3)
    wat_dir = str(tmp_path / "wat")
    manifest = W.write_wat(df, wat_dir).collect()
    assert sum(m.n_records for m in manifest) == 10
    got = {r.url: json.loads(bytes(r.html)) for r in
           W.read_warc(spark, wat_dir, record_types=("metadata",))
           .collect()}
    for i in range(10):
        u = f"https://e.org/{i}"
        assert got[u] == {"warc_ts": "2026-01-01T00:00:00Z",
                          "status": 200 + i % 2,
                          "content_type": "text/html",
                          "n_bytes": 100 * i}


def test_gzip_member_split_chunked_feed(monkeypatch):
    # the streaming-chunk decompressor must honor member boundaries that
    # land mid-chunk: force a tiny chunk size so every member spans
    # multiple chunks AND multiple members share chunks.
    pages = _pages(4)
    blob = W.encode_warc(pages, per_record_gzip=True)
    expect = list(W.split_gzip_members(blob))
    monkeypatch.setattr(W, "_GZ_CHUNK", 7)
    got = list(W.split_gzip_members(blob))
    assert got == expect
    # truncated final member still yields its partial prefix, no raise
    monkeypatch.setattr(W, "_GZ_CHUNK", 1 << 20)
    trunc = list(W.split_gzip_members(blob[:-20]))
    assert len(trunc) == len(expect)
    assert trunc[:-1] == expect[:-1]


def test_wet_sink_cleans_stale_parts(spark, tmp_path):
    df8 = spark.createDataFrame(
        [(f"https://e.org/{i}", f"text {i}") for i in range(8)],
        "url string, text string").repartition(8)
    out = str(tmp_path / "wet")
    W.write_wet(df8, out).collect()
    first = sorted(p.name for p in (tmp_path / "wet").iterdir())
    # re-run with FEWER partitions: parts from the wider first run must
    # not survive to be unioned into reads
    df1 = df8.coalesce(1)
    W.write_wet(df1, out).collect()
    second = [p.name for p in (tmp_path / "wet").iterdir()
              if p.name.endswith(".warc.gz")]
    assert len(first) > 1 and len(second) == 1
    back = W.read_warc(spark, out, record_types=("conversion",))
    assert back.count() == 8  # all 8 rows, from ONE file


def test_surt_key_canonicalization(spark):
    from tuatara_spark.sources import cdx
    cases = [
        ("https://www.Sub.Example.com/p/1?b=2&a=1",
         "com,example,sub)/p/1?a=1&b=2"),
        ("http://EXAMPLE.com:80", "com,example)/"),          # default port
        ("https://example.com:443/x", "com,example)/x"),
        ("https://h.example.com:8080/x", "com,example,h:8080)/x"),
        ("https://www2.foo.com/a#frag", "com,foo)/a"),       # fragment off
        ("http://a.b/", "b,a)/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.k for r in
           df.select(cdx.surt_key().alias("k")).collect()]
    assert got == [want for _, want in cases]


def test_cdx_index_sorted_and_line_format(spark):
    from tuatara_spark.sources import cdx
    rows = [("https://b.example.com/x", "2024-01-02T03:04:05Z", b"abc"),
            ("https://a.example.com/y", "2024-01-02T03:04:06Z", b"xy"),
            ("https://a.example.com/y", "2023-12-31T23:59:59Z", b"xy")]
    df = spark.createDataFrame(rows,
                               "url string, warc_ts string, html binary")
    out = cdx.cdx_index(df).collect()
    keys = [(r.surt, r.ts14) for r in out]
    assert keys == sorted(keys)          # globally (surt, ts14)-sorted
    assert keys[0][0] == "com,example,a)/y"
    assert keys[0][1] == "20231231235959"
    r0 = out[0]
    assert r0.length == 2
    assert r0.cdxj_line == (
        f'{r0.surt} {r0.ts14} {{"url": "{r0.url}", "mime": "text/html", '
        f'"digest": "{r0.digest}", "length": "2"}}')
    assert len(r0.digest) == 64          # sha256 hex


def test_jsonl_shards_roundtrip_determinism_unicode(spark, tmp_path):
    """JSONL sink: byte-identical re-runs (sorted keys, compact
    separators, mtime=0 gzip), unicode and JSON-escaping round trip,
    manifest row counts."""
    import glob

    from tuatara_spark.sources import jsonl as J
    df = spark.createDataFrame(
        [("u1", "héllo — wörld", 3), ("u2", 'quote " and \\ back', -1)],
        "url string, text string, n int").repartition(2, "url")
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    m = J.write_jsonl_shards(df, d1).collect()
    J.write_jsonl_shards(df, d2).collect()
    blobs = lambda d: [open(f, "rb").read() for f in
                       sorted(glob.glob(d + "/part-*.jsonl.gz"))]
    assert blobs(d1) == blobs(d2)       # deterministic bytes
    back = {r.url: (r.text, r.n) for r in J.read_jsonl_shards(
        spark, d1, schema="n long, text string, url string").collect()}
    assert back == {"u1": ("héllo — wörld", 3),
                    "u2": ('quote " and \\ back', -1)}
    assert sum(r.n_records for r in m) == 2
    assert all(r.n_bytes > 0 and r.file.endswith(".jsonl.gz") for r in m)
