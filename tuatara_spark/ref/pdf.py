"""Minimal PDF text layer — pure Python/stdlib, clean-room from the public
PDF references (Adobe PDF 1.4, 2001; ISO 32000-1 for 1.5+ features):
content streams behind FlateDecode / ASCIIHexDecode / ASCII85Decode /
RunLengthDecode filter CHAINS, BT/ET text objects, Tj / TJ / ' show
operators with literal AND hex string arguments, Td/TD/T* line moves,
literal string escapes (backslash + octal). Completes the north_rule's
literal operator list ("HTML boilerplate strip, PDF/layout parse, DOM
heuristics") alongside ops/htmlx.py.

Scope is the text-extraction slice a crawl pipeline needs: walk stream
objects (no xref required — objects are self-delimiting), run each
stream's filter chain in spec order, reconstruct reading order from
text-object line moves. PDF 1.5 cross-reference and object STREAMS are
handled by skipping them during the scan (/Type /XRef, /Type /ObjStm —
their inflated binary/serialized-object payloads must not be mistaken
for content; content streams cannot live inside an ObjStm, so no text is
lost). NOT a renderer: fonts/encodings beyond the
standard-Latin strings and image filters (DCT/LZW/JBIG2) are out of
scope and raise cleanly (→ error rows upstream).

The fixture-grade writer emits one-page PDFs with any supported filter
chain, literal or hex show strings, and either a classic xref table or a
PDF 1.5 xref stream, so decode exercises every real path.
"""

from __future__ import annotations

import base64
import re
import zlib


def _escape(s: str) -> str:
    out = []
    for ch in s:
        if ch in "()\\":
            out.append("\\" + ch)
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        else:
            out.append(ch)
    return "".join(out)


# ---- stream filters (PDF 1.4 §3.3 / ISO 32000-1 §7.4), both directions --


def _hex_decode(data: bytes) -> bytes:
    """ASCIIHexDecode: whitespace ignored, '>' is EOD, odd final digit is
    padded with 0."""
    h = re.sub(rb"\s", b"", data.split(b">", 1)[0])
    if len(h) % 2:
        h += b"0"
    return bytes.fromhex(h.decode("ascii"))


def _a85_decode(data: bytes) -> bytes:
    """ASCII85Decode: Adobe alphabet with 'z' groups; PDF streams end with
    '~>' but are NOT '<~'-framed, so strip the EOD ourselves."""
    d = re.sub(rb"\s", b"", data)
    if d.endswith(b"~>"):
        d = d[:-2]
    return base64.a85decode(d)


def _rle_decode(data: bytes) -> bytes:
    """RunLengthDecode: L<128 → copy next L+1 bytes; L>128 → repeat next
    byte 257−L times; 128 is EOD."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        ln = data[i]
        if ln == 128:
            break
        if ln < 128:
            out += data[i + 1:i + 2 + ln]
            i += 2 + ln
        else:
            out += data[i + 1:i + 2] * (257 - ln)
            i += 2
    return bytes(out)


def _rle_encode(data: bytes) -> bytes:
    """Simple spec-valid RunLength encoder: runs ≥3 as repeats, the rest
    as literal copies (≤128 per op)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            out += bytes((257 - (j - i), data[i]))
            i = j
        else:
            j = i + 1
            while (j < n and j - i < 128
                   and not (j + 2 < n and data[j] == data[j + 1] == data[j + 2])):
                j += 1
            out += bytes((j - i - 1,)) + data[i:j]
            i = j
    out.append(128)
    return bytes(out)


# name → (encode, decode); dict order is not meaningful, chains are.
_FILTERS = {
    b"FlateDecode": (zlib.compress, zlib.decompress),
    b"ASCIIHexDecode": (lambda d: d.hex().encode("ascii") + b">",
                        _hex_decode),
    b"ASCII85Decode": (lambda d: base64.a85encode(d) + b"~>", _a85_decode),
    b"RunLengthDecode": (_rle_encode, _rle_decode),
}
_FILTER_NAME_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")


def _decode_stream(hdr: bytes, stream: bytes) -> bytes:
    """Apply the stream's /Filter chain. The array lists filters in
    DECODE order (first listed = first applied when decoding)."""
    m = _FILTER_NAME_RE.search(hdr)
    if not m:
        return stream
    for name in re.findall(rb"/([A-Za-z0-9]+)", m.group(1)):
        if name not in _FILTERS:
            raise NotImplementedError(
                f"PDF filter /{name.decode()} — needs a codec library "
                "not present in this environment")
        stream = _FILTERS[name][1](stream)
    return stream


def encode_pdf(lines: list[str], compress: bool = True,
               wrap_filter: str | None = None, hex_strings: bool = False,
               xref_stream: bool = False) -> bytes:
    """lines → a single-page PDF (Helvetica 12pt, 14pt leading).

    ``compress`` flate-compresses the content stream; ``wrap_filter``
    ("hex" | "a85" | "rle") additionally wraps it, producing a two-filter
    chain (/Filter [wrap /FlateDecode] — wrap listed first because it is
    undone first). ``hex_strings`` emits show strings as <hex> literals.
    ``xref_stream`` writes a PDF 1.5 cross-reference STREAM (/Type /XRef,
    /W [1 4 2], flate-compressed binary entries) instead of the classic
    xref table."""
    body = ["BT /F1 12 Tf 72 720 Td 14 TL"]
    for i, line in enumerate(lines):
        if i:
            body.append("T*")
        if hex_strings:
            body.append("<" + line.encode("latin-1", "replace").hex()
                        + "> Tj")
        else:
            body.append(f"({_escape(line)}) Tj")
    body.append("ET")
    content = " ".join(body).encode("latin-1", "replace")
    chain = []                       # decode-order filter names
    if compress:
        content = zlib.compress(content)
        chain.insert(0, b"/FlateDecode")
    if wrap_filter:
        name = {"hex": b"ASCIIHexDecode", "a85": b"ASCII85Decode",
                "rle": b"RunLengthDecode"}[wrap_filter]
        content = _FILTERS[name][0](content)
        chain.insert(0, b"/" + name)
    if len(chain) == 1:
        filt = b"/Filter " + chain[0] + b" "
    elif chain:
        filt = b"/Filter [" + b" ".join(chain) + b"] "
    else:
        filt = b""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< " + filt + b"/Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    ver = b"%PDF-1.5\n" if xref_stream else b"%PDF-1.4\n"
    out = bytearray(ver)
    offsets = []
    for i, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref = len(out)
    if xref_stream:
        # ISO 32000-1 §7.5.8: entries are (type, offset, gen) packed per
        # /W; obj 0 is the type-0 free-list head, the XRef stream itself
        # is the last entry.
        n = len(objs) + 2
        ent = bytearray(b"\x00" + (0).to_bytes(4, "big") + b"\xff\xff")
        for off in offsets + [xref]:
            ent += b"\x01" + off.to_bytes(4, "big") + b"\x00\x00"
        xdata = zlib.compress(bytes(ent))
        out += (f"{n - 1} 0 obj\n<< /Type /XRef /Size {n} /W [1 4 2] "
                f"/Root 1 0 R /Filter /FlateDecode "
                f"/Length {len(xdata)} >>\nstream\n").encode()
        out += xdata + b"\nendstream\nendobj\n"
        out += f"startxref\n{xref}\n%%EOF\n".encode()
    else:
        out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
        for off in offsets:
            out += f"{off:010d} 00000 n \n".encode()
        out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
                f"startxref\n{xref}\n%%EOF\n").encode()
    return bytes(out)


_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S)
# text-showing / positioning operators inside BT..ET; show strings are
# literal (...) or hex <...> (PDF 1.4 §3.2.3 hex form)
_TOK_RE = re.compile(
    rb"(?:\((?P<str>(?:\\.|[^\\()])*)\)"
    rb"|<(?P<hexs>[0-9A-Fa-f\s]*)>)\s*(?P<op>Tj|')"
    rb"|\[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ"              # array show
    rb"|(?P<tstar>T\*)"                                  # next line
    rb"|(?P<td>[-0-9.]+\s+[-0-9.]+\s+T[dD])", re.S)
_BT_RE = re.compile(rb"BT(.*?)ET", re.S)
_ARR_STR_RE = re.compile(rb"\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>")
# structural PDF 1.5 stream types whose (binary / serialized-object)
# content must never be scanned for BT/ET text: cross-reference streams
# and object streams (content streams cannot live inside an ObjStm —
# streams are barred from object streams — so skipping loses no text)
_SKIP_TYPE_RE = re.compile(rb"/Type\s*/(XRef|ObjStm)\b")


def _hex_str(raw: bytes) -> str:
    """Hex show string → text (whitespace ignored, odd digit padded)."""
    h = re.sub(rb"\s", b"", raw)
    if len(h) % 2:
        h += b"0"
    return bytes.fromhex(h.decode("ascii")).decode("latin-1")


def _arr_str(tok: bytes) -> str:
    return (_hex_str(tok[1:-1]) if tok[:1] == b"<"
            else _unescape(tok[1:-1]))
_ESC_MAP = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08, 0x66: 0x0C}


def _unescape(raw: bytes) -> str:
    """Single-pass literal-string unescape (T.81-era PDF 1.4 §3.2.3).
    A pass of regex substitutions would mis-handle sequences like
    ``\\\\0`` (escaped backslash followed by a digit — NOT an octal
    escape); only a left-to-right scan gets the precedence right."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        b = raw[i]
        if b != 0x5C:                      # not a backslash
            out.append(b)
            i += 1
            continue
        i += 1
        if i >= n:                          # trailing '\' — ignored
            break
        c = raw[i]
        if c in _ESC_MAP:
            out.append(_ESC_MAP[c])
            i += 1
        elif 0x30 <= c <= 0x37:             # \d, \dd or \ddd octal
            j = i
            while j < min(i + 3, n) and 0x30 <= raw[j] <= 0x37:
                j += 1
            out.append(int(raw[i:j], 8) & 0xFF)
            i = j
        elif c == 0x0A:                     # '\' + newline: continuation
            i += 1
        else:                               # \( \) \\ or unknown → literal
            out.append(c)
            i += 1
    return out.decode("latin-1")


def extract_pdf_text(buf) -> str:
    """All text shown by BT/ET blocks across content streams, lines split
    on T* / Td / TD / ' moves, '\\n'-joined in stream order."""
    data = bytes(memoryview(buf))
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    lines: list[str] = []
    n_streams = 0
    for m in _STREAM_RE.finditer(data):
        hdr, stream = m.group(1), m.group(2)
        if _SKIP_TYPE_RE.search(hdr):   # PDF 1.5 XRef/ObjStm: never text
            continue
        stream = _decode_stream(hdr, stream)
        n_streams += 1
        for bt in _BT_RE.finditer(stream):
            cur: list[str] = []
            for tok in _TOK_RE.finditer(bt.group(1)):
                if tok.group("op") is not None:
                    cur.append(_unescape(tok.group("str"))
                               if tok.group("str") is not None
                               else _hex_str(tok.group("hexs")))
                    if tok.group("op") == b"'":
                        lines.append("".join(cur[:-1]))
                        cur = [cur[-1]]
                elif tok.group("arr") is not None:
                    cur.extend(_arr_str(s)
                               for s in _ARR_STR_RE.findall(tok.group("arr")))
                elif cur:  # T* or Td/TD line move ends the current line
                    lines.append("".join(cur))
                    cur = []
            if cur:
                lines.append("".join(cur))
    if not n_streams:
        raise ValueError("PDF: no content stream found")
    return "\n".join(lines)
