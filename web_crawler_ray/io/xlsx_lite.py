"""Minimal .xlsx writer/reader on the stdlib only (zipfile + ElementTree).

An .xlsx file is a zip of XML parts (ECMA-376 / ISO 29500, public
spec). openpyxl is absent in this container, so this module implements
the small subset the engine needs — closing SURVEY §2.1 K2 (the
reference's multi-sheet Excel report, pacong/output/excel_writer.py:20-87)
and the xlsx branch of S4 (worldbank workbook ingest,
pacong/scrapers/worldbank.py:60-119) with REAL workbook files:

- ``write_xlsx``: multi-sheet, strings as inline strings (no
  sharedStrings table needed), numbers as native numeric cells,
  deterministic zip metadata (fixed timestamps, sorted part order) so
  byte-identical inputs give byte-identical workbooks.
- ``read_xlsx``: sheet discovery via workbook.xml + its rels, cell
  grid per sheet honoring cell references (sparse rows), inline
  strings, sharedStrings (so workbooks from other writers parse too),
  and numeric coercion.

Both ends are pure driver/worker-local byte transforms — the engine
moves workbook BYTES through Ray (read_binary_files → map_batches);
nothing here touches the Dataset API.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NSR = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_NSP = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    "{sheet_overrides}"
    "</Types>"
)
_SHEET_OVERRIDE = (
    '<Override PartName="/xl/worksheets/sheet{i}.xml" '
    'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
)
_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" '
    'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
    'Target="xl/workbook.xml"/></Relationships>'
)


def col_letter(idx: int) -> str:
    """0-based column index → A1-style letters (0→A, 25→Z, 26→AA)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def col_index(ref: str) -> int:
    """A1-style cell/column reference → 0-based column index."""
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


def _cell_xml(ref: str, value) -> str:
    if value is None or (isinstance(value, float) and value != value):
        return ""  # omitted cell = blank
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    text = escape(str(value))
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{text}</t></is></c>'


def _sheet_xml(df: pd.DataFrame) -> str:
    rows = []
    header = f"<row r=\"1\">" + "".join(
        _cell_xml(f"{col_letter(j)}1", str(c)) for j, c in enumerate(df.columns)
    ) + "</row>"
    rows.append(header)
    for i, (_, rec) in enumerate(df.iterrows(), start=2):
        cells = "".join(
            _cell_xml(f"{col_letter(j)}{i}", v) for j, v in enumerate(rec)
        )
        rows.append(f'<row r="{i}">{cells}</row>')
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(rows)}</sheetData></worksheet>"
    )


def write_xlsx(sheets: dict[str, pd.DataFrame], path: str | None = None) -> bytes:
    """Write a multi-sheet workbook; returns the bytes (and writes to
    ``path`` when given). Sheet order follows dict insertion order.
    Deterministic: fixed zip timestamps, no volatile metadata."""
    names = list(sheets)
    if not names:
        raise ValueError("write_xlsx: at least one sheet required")
    bad = [n for n in names if not n or len(n) > 31 or re.search(r"[\\/*?\[\]:]", n)]
    if bad:
        raise ValueError(f"invalid xlsx sheet names: {bad}")

    sheet_tags = "".join(
        f'<sheet name="{escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{sheet_tags}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + "</Relationships>"
    )
    parts = [
        ("[Content_Types].xml", _CONTENT_TYPES.format(sheet_overrides="".join(
            _SHEET_OVERRIDE.format(i=i + 1) for i in range(len(names))))),
        ("_rels/.rels", _ROOT_RELS),
        ("xl/workbook.xml", workbook),
        ("xl/_rels/workbook.xml.rels", wb_rels),
    ] + [
        (f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(sheets[n]))
        for i, n in enumerate(names)
    ]
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, xml in parts:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, xml)
    data = buf.getvalue()
    if path is not None:
        with open(path, "wb") as f:
            f.write(data)
    return data


def _coerce(raw: str, ctype: str | None, shared: list[str]):
    if ctype == "s":
        return shared[int(raw)]
    if ctype == "b":
        return bool(int(raw))
    if ctype in ("str", "inlineStr", "e"):
        return raw
    try:
        f = float(raw)
        return int(f) if f.is_integer() and "e" not in raw.lower() and "." not in raw else f
    except ValueError:
        return raw


def read_xlsx(src: bytes | str) -> dict[str, pd.DataFrame]:
    """Read every sheet into a RAW grid frame (integer column labels,
    all rows data — header selection is the caller's policy, see
    :func:`grid_to_frame`). Handles inline strings, sharedStrings,
    numbers, booleans, and sparse rows with explicit cell refs."""
    data = open(src, "rb").read() if isinstance(src, str) else src
    z = zipfile.ZipFile(io.BytesIO(data))
    shared: list[str] = []
    if "xl/sharedStrings.xml" in z.namelist():
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
        for si in root.iter(f"{_NS}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    target = {
        rel.get("Id"): rel.get("Target")
        for rel in rels.iter(f"{_NSP}Relationship")
    }
    out: dict[str, pd.DataFrame] = {}
    for sheet in wb.iter(f"{_NS}sheet"):
        name = sheet.get("name")
        t = target[sheet.get(f"{_NSR}id")]
        part = t if t.startswith("xl/") else f"xl/{t.lstrip('/')}"
        ws = ET.fromstring(z.read(part))
        rows: list[dict[int, object]] = []
        for row in ws.iter(f"{_NS}row"):
            cells: dict[int, object] = {}
            auto_col = 0
            for c in row.iter(f"{_NS}c"):
                ref = c.get("r")
                j = col_index(ref) if ref else auto_col
                auto_col = j + 1
                ctype = c.get("t")
                if ctype == "inlineStr":
                    is_el = c.find(f"{_NS}is")
                    val = "".join(tt.text or "" for tt in is_el.iter(f"{_NS}t")) if is_el is not None else None
                else:
                    v = c.find(f"{_NS}v")
                    val = _coerce(v.text or "", ctype, shared) if v is not None and v.text is not None else None
                if val is not None:
                    cells[j] = val
            rows.append(cells)
        ncols = max((max(r) + 1 for r in rows if r), default=0)
        grid = [[r.get(j) for j in range(ncols)] for r in rows]
        # object dtype: keep ints as ints and missing cells as None
        # (default inference would coerce a mixed column to float/NaN)
        out[name] = pd.DataFrame(grid, columns=range(ncols), dtype=object)
    return out


def grid_to_frame(grid: pd.DataFrame, header_row: int) -> pd.DataFrame:
    """Raw grid → frame with row ``header_row`` as column names and the
    rows after it as data (pandas ``header=`` semantics)."""
    if header_row >= len(grid):
        raise ValueError("header_row past end of sheet")
    header = ["" if v is None else str(v) for v in grid.iloc[header_row]]
    body = grid.iloc[header_row + 1:].reset_index(drop=True)
    body.columns = header
    return body
