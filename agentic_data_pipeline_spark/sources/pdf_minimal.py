"""Minimal self-contained PDF text codec (no pypdf dependency).

The reference extracts per-page text with pypdf (engine.py:29-33); this
container doesn't ship it. A PDF with *uncompressed* content streams is
plain text with postfix operators, and per-page text extraction for that
subset — `(…) Tj` and `[…] TJ` show-text operators, standard escapes — is
small enough to implement directly. pypdf remains preferred when installed
(sources/ingest.py tries it first).

Scope (deliberate): uncompressed streams only (no /FlateDecode — that needs
zlib, which IS available, so deflated streams are inflated too), Latin-1
text, no font/encoding tables (CID-keyed fonts won't extract). Files
written by `write_pdf` and by most simple generators round-trip; a scanned
or subset-font PDF needs the real pypdf path.
"""

from __future__ import annotations

import re
import zlib

_ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
        b"(": b"(", b")": b")", b"\\": b"\\"}


def _pdf_escape(text: str) -> str:
    return text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def write_pdf(pages: list[str], path: str) -> None:
    """Write one uncompressed text PDF, one content stream per page."""
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_ids: list[int] = []
    content_ids: list[int] = []
    for text in pages:
        lines = text.split("\n")
        ops = ["BT", "/F1 10 Tf", "72 760 Td", "12 TL"]
        for i, line in enumerate(lines):
            if i:
                ops.append("T*")
            ops.append(f"({_pdf_escape(line)}) Tj")
        ops.append("ET")
        stream = "\n".join(ops).encode("latin-1", "replace")
        content_ids.append(add(
            b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n"
            + stream + b"\nendstream"))
    pages_id = len(objs) + len(pages) + 1
    for cid in content_ids:
        page_ids.append(add(
            f"<< /Type /Page /Parent {pages_id} 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font} 0 R >> >> "
            f"/Contents {cid} 0 R >>".encode()))
    kids = " ".join(f"{p} 0 R" for p in page_ids)
    assert add(
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_ids)} >>".encode()
    ) == pages_id
    catalog = add(f"<< /Type /Catalog /Pages {pages_id} 0 R >>".encode())

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root {catalog} 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    with open(path, "wb") as f:
        f.write(bytes(out))


def _decode_string(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        ch = raw[i:i + 1]
        if ch == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1:i + 2]
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                digits = b""
                while j < len(raw) and len(digits) < 3 and raw[j:j + 1].isdigit():
                    digits += raw[j:j + 1]
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
                continue
            out += _ESC.get(nxt, nxt)
            i += 2
            continue
        out += ch
        i += 1
    return out.decode("latin-1")


_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S)
_SHOW_RE = re.compile(
    rb"\(((?:\\.|[^\\()])*)\)\s*Tj"      # (text) Tj
    rb"|\[((?:[^\]\\]|\\.)*)\]\s*TJ"     # [ (a) -120 (b) ] TJ
    rb"|(T\*|Td|TD)", re.S)
_TJ_PART = re.compile(rb"\(((?:\\.|[^\\()])*)\)")


def extract_pages(payload: bytes) -> list[str]:
    """Per-page text of an uncompressed/deflated simple PDF."""
    pages: list[str] = []
    for m in _STREAM_RE.finditer(payload):
        header, data = m.group(1), m.group(2)
        if b"/FlateDecode" in header:
            try:
                data = zlib.decompress(data.strip(b"\r\n"))
            except zlib.error:
                continue
        if b"BT" not in data:
            continue
        parts: list[str] = []
        for sm in _SHOW_RE.finditer(data):
            if sm.group(1) is not None:
                parts.append(_decode_string(sm.group(1)))
            elif sm.group(2) is not None:
                parts.append("".join(
                    _decode_string(x.group(1))
                    for x in _TJ_PART.finditer(sm.group(2))))
            else:  # T*/Td/TD line advance
                parts.append("\n")
        text = "".join(parts)
        # collapse leading/trailing advances introduced by positioning ops
        pages.append(re.sub(r"\n{2,}", "\n", text).strip("\n"))
    return pages
