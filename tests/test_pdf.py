"""Clean-room PDF text layer (ref/pdf.py) + the Spark extraction op."""

import pandas as pd
import pytest

from tuatara_spark.ops import multimodal
from tuatara_spark.ref import pdf as P


def test_round_trip_escapes_and_modes():
    lines = ["Hello (world) \\ test", "second line", "",
             "fourth: 100% [ok] }{"]
    for compress in (True, False):
        buf = P.encode_pdf(lines, compress=compress)
        assert buf.startswith(b"%PDF-1.4")
        assert P.extract_pdf_text(buf) == "\n".join(lines)
    assert P.encode_pdf(lines) == P.encode_pdf(lines)  # deterministic


def test_tj_array_quote_and_octal():
    """Hand-built content stream: TJ array show with kerning numbers, the
    ' (next-line-show) operator, and octal escapes."""
    content = (b"BT 72 720 Td [(ab)-120(cd)] TJ (ef) ' (\\101\\102) Tj ET")
    raw = (b"%PDF-1.4\n1 0 obj << /Length " +
           str(len(content)).encode() + b" >>\nstream\n" + content +
           b"\nendstream\nendobj")
    assert P.extract_pdf_text(raw) == "abcd\nefAB"


def test_malformed_and_unsupported():
    with pytest.raises(ValueError):
        P.extract_pdf_text(b"not a pdf")
    with pytest.raises(ValueError):
        P.extract_pdf_text(b"%PDF-1.4 no stream here")
    lzw = (b"%PDF-1.4\n1 0 obj << /Filter /LZWDecode /Length 2 >>\n"
           b"stream\nxx\nendstream\nendobj")
    with pytest.raises(NotImplementedError):
        P.extract_pdf_text(lzw)


def test_spark_pdf_extract_op(spark):
    rows = pd.DataFrame({
        "url": ["a", "b", "bad"],
        "html": [P.encode_pdf(["line one", "line two"]),
                 P.encode_pdf([]),
                 b"%PDF-1.4 truncated"],
    })
    got = {r.url: r for r in multimodal.extract_pdf_text_col(
        spark.createDataFrame(rows)).collect()}
    assert got["a"].text == "line one\nline two" and got["a"].error is None
    assert got["a"].n_chars == len("line one\nline two")
    assert got["b"].text == ""
    assert got["bad"].text is None and got["bad"].error.startswith("pdf:")


from hypothesis import given, settings
from hypothesis import strategies as st

_PDF_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=60)


@settings(max_examples=80, deadline=None)
@given(st.lists(_PDF_TEXT, max_size=6), st.booleans(),
       st.sampled_from([None, "hex", "a85", "rle"]), st.booleans(),
       st.booleans())
def test_fuzz_pdf_text_round_trip(lines, compress, wrap, hexs, xrs):
    """Property: any printable-ASCII line list round-trips the PDF writer/
    extractor exactly — parens, backslashes, empty lines — across every
    container variant (filter chains, hex strings, 1.5 xref streams)."""
    buf = P.encode_pdf(lines, compress=compress, wrap_filter=wrap,
                       hex_strings=hexs, xref_stream=xrs)
    assert P.extract_pdf_text(buf) == "\n".join(lines)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_fuzz_pdf_filters_round_trip(blob):
    """Property: every stream filter is a lossless codec on arbitrary
    bytes (runs, binary, empty)."""
    for name, (enc, dec) in P._FILTERS.items():
        assert dec(enc(blob)) == blob, name


def test_unknown_filter_raises_cleanly():
    buf = P.encode_pdf(["x"]).replace(b"/FlateDecode", b"/DCTDecode  ")
    import pytest as _pt
    with _pt.raises(NotImplementedError, match="DCTDecode"):
        P.extract_pdf_text(buf)


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_fuzz_pdf_garbage_never_hangs(payload):
    for buf in (payload, b"%PDF-1.4\n" + payload):
        try:
            out = P.extract_pdf_text(buf)
        except Exception:
            continue
        assert isinstance(out, str)


def test_objstm_content_never_scanned():
    """An ObjStm whose decompressed bytes happen to contain BT..(x) Tj..ET
    must NOT contribute text (object streams hold serialized objects,
    never content streams)."""
    import zlib as _z
    decoy = _z.compress(b"1 0 BT (DECOY) Tj ET")
    objstm = (b"9 0 obj\n<< /Type /ObjStm /N 1 /First 8 /Filter "
              b"/FlateDecode /Length " + str(len(decoy)).encode()
              + b" >>\nstream\n" + decoy + b"\nendstream\nendobj\n")
    buf = P.encode_pdf(["real text"])
    patched = buf.replace(b"%PDF-1.4\n", b"%PDF-1.5\n" + objstm)
    assert P.extract_pdf_text(patched) == "real text"
