"""Minimal self-contained XLSX codec (no openpyxl dependency).

The reference reads Excel via pandas+openpyxl (engine.py:25-26,
requirements.txt:14); this container ships neither openpyxl nor xlrd, so
ingestion would be a stub. XLSX is just a zip of XML parts, and the subset
an analytics engine needs — one sheet, header row, inline strings, numeric
cells — is small enough to implement directly. pandas/openpyxl are still
preferred when present (sources/ingest.py tries them first); this codec is
the fallback that keeps the capability real.

Scope (deliberate): single sheet, no styles/formulas/dates-as-serials;
strings are written inline (no sharedStrings table) but *both* inline and
shared strings are understood on read, so files from openpyxl/Excel with
plain values load too. Numbers round-trip exactly (shortest-repr doubles).
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_ref(i: int) -> str:
    """0-based column index → A1-style letters."""
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def write_xlsx(pdf: pd.DataFrame, path: str) -> None:
    """Write a DataFrame as a single-sheet xlsx (header row + values)."""
    rows_xml: list[str] = []

    def cell(r: int, c: int, v) -> str:
        ref = f"{_col_ref(c)}{r + 1}"
        if hasattr(v, "item"):  # numpy scalar → python scalar
            v = v.item()
        if v is None or (isinstance(v, float) and v != v):
            return f'<c r="{ref}"/>'
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, int):
            return f'<c r="{ref}"><v>{v}</v></c>'
        if isinstance(v, float):
            return f'<c r="{ref}"><v>{float.__repr__(v)}</v></c>'
        return (f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                f"{escape(str(v))}</t></is></c>")

    header = "".join(cell(0, c, name) for c, name in enumerate(pdf.columns))
    rows_xml.append(f'<row r="1">{header}</row>')
    for r in range(len(pdf)):
        cells = "".join(
            cell(r + 1, c, pdf.iloc[r, c]) for c in range(len(pdf.columns)))
        rows_xml.append(f'<row r="{r + 2}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(rows_xml)}</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def _cell_col(ref: str) -> int:
    letters = re.match(r"[A-Z]+", ref).group(0)
    i = 0
    for ch in letters:
        i = i * 26 + (ord(ch) - ord("A") + 1)
    return i - 1


def read_xlsx(path: str) -> pd.DataFrame:
    """Read sheet1 of an xlsx into a DataFrame (first row = header).

    Understands inline strings, shared strings, booleans, and numeric cells
    — the value subset that survives a round-trip through an analytics
    engine. Numbers come back as int when integral, else float.
    """
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))

    rows: list[dict[int, object]] = []
    for row in sheet.iter(f"{_NS}row"):
        vals: dict[int, object] = {}
        for c in row.findall(f"{_NS}c"):
            col = _cell_col(c.attrib.get("r", "A1"))
            t = c.attrib.get("t", "n")
            if t == "inlineStr":
                is_el = c.find(f"{_NS}is")
                vals[col] = "".join(x.text or "" for x in is_el.iter(f"{_NS}t"))
            else:
                v = c.find(f"{_NS}v")
                if v is None or v.text is None:
                    vals[col] = None
                elif t == "s":
                    vals[col] = shared[int(v.text)]
                elif t == "b":
                    vals[col] = v.text == "1"
                elif t == "str":
                    vals[col] = v.text
                else:
                    f = float(v.text)
                    vals[col] = int(f) if f.is_integer() and "." not in v.text \
                        and "e" not in v.text.lower() else f
        rows.append(vals)
    if not rows:
        return pd.DataFrame()
    width = max(max(r.keys(), default=-1) for r in rows) + 1
    header = [str(rows[0].get(i, f"col{i}")) for i in range(width)]
    data = [[r.get(i) for i in range(width)] for r in rows[1:]]
    return pd.DataFrame(data, columns=header)
