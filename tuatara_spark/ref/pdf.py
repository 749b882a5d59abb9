"""Minimal PDF text layer — pure Python/stdlib, clean-room from the public
PDF 1.4 reference (Adobe, 2001): Flate-compressed content streams, BT/ET
text objects, Tj / TJ / ' show operators, Td/TD/T* line moves, literal
string escapes (backslash + octal). Completes the north_rule's literal
operator list ("HTML boilerplate strip, PDF/layout parse, DOM heuristics")
alongside ops/htmlx.py.

Scope is the text-extraction slice a crawl pipeline needs: walk stream
objects (no xref required — objects are self-delimiting), inflate
FlateDecode streams, reconstruct reading order from text-object line moves.
NOT a renderer: fonts/encodings beyond the standard-Latin literal strings
are out of scope and raise cleanly (→ error rows upstream).

The fixture-grade writer emits one-page PDFs with Flate-compressed content
streams so decode exercises the real path.
"""

from __future__ import annotations

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


def encode_pdf(lines: list[str], compress: bool = True) -> bytes:
    """lines → a single-page PDF 1.4 (Helvetica 12pt, 14pt leading)."""
    body = ["BT /F1 12 Tf 72 720 Td 14 TL"]
    for i, line in enumerate(lines):
        if i:
            body.append("T*")
        body.append(f"({_escape(line)}) Tj")
    body.append("ET")
    content = " ".join(body).encode("latin-1", "replace")
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< " + filt + b"/Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref}\n%%EOF\n").encode()
    return bytes(out)


_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S)
# text-showing / positioning operators inside BT..ET
_TOK_RE = re.compile(
    rb"\((?P<str>(?:\\.|[^\\()])*)\)\s*(?P<op>Tj|')"   # literal string show
    rb"|\[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ"              # array show
    rb"|(?P<tstar>T\*)"                                  # next line
    rb"|(?P<td>[-0-9.]+\s+[-0-9.]+\s+T[dD])", re.S)
_BT_RE = re.compile(rb"BT(.*?)ET", re.S)
_ARR_STR_RE = re.compile(rb"\((?:\\.|[^\\()])*\)")
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
        if b"/FlateDecode" in hdr:
            stream = zlib.decompress(stream)
        elif b"/Filter" in hdr:
            raise NotImplementedError(
                "PDF filter other than FlateDecode — needs a codec "
                "library not present in this environment")
        n_streams += 1
        for bt in _BT_RE.finditer(stream):
            cur: list[str] = []
            for tok in _TOK_RE.finditer(bt.group(1)):
                if tok.group("str") is not None:
                    cur.append(_unescape(tok.group("str")))
                    if tok.group("op") == b"'":
                        lines.append("".join(cur[:-1]))
                        cur = [cur[-1]]
                elif tok.group("arr") is not None:
                    cur.extend(_unescape(s[1:-1])
                               for s in _ARR_STR_RE.findall(tok.group("arr")))
                elif cur:  # T* or Td/TD line move ends the current line
                    lines.append("".join(cur))
                    cur = []
            if cur:
                lines.append("".join(cur))
    if not n_streams:
        raise ValueError("PDF: no content stream found")
    return "\n".join(lines)
