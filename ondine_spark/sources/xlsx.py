"""Minimal dependency-free .xlsx reader + writer (S4/S8 fallback).

An .xlsx file is a zip of OOXML parts; the subset a data pipeline needs —
shared strings, inline strings, numbers, booleans, pick-a-sheet — parses
with stdlib ``zipfile`` + ``ElementTree``, and the write side emits the
same subset (inline strings, so no sharedStrings part is needed). The
reference tests Excel ingestion for real
(tests/verification/test_verify_data_formats.py) via pandas+openpyxl and
writes .xlsx results (ondine/cli/main.py:105 ``df.to_excel``); this
module makes both paths work where openpyxl is not installable, with
pandas+openpyxl still preferred when present (sources/readers.py tries
it first).

Scope: cell VALUES only (no formula evaluation — the cached <v> result is
used, which is what every reader reports; no styles/dates coercion —
dates surface as their serial numbers, same as pandas with
``convert_float`` semantics disabled). Driver-side like every xlsx
reader; the loader parallelizes the resulting rows immediately.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKG_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _col_index(ref: str) -> int:
    """'A1' -> 0, 'AB7' -> 27."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return n - 1


def _cell_value(c, shared: list[str]) -> str | float | bool | None:
    t = c.get("t", "n")
    if t == "inlineStr":
        return "".join(
            el.text or "" for el in c.iter(f"{_NS}t")
        )
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text == "1"
    if t in ("str", "e"):
        return v.text
    # numeric: keep ints clean ("3" not "3.0") like pandas' object read
    txt = v.text
    try:
        f = float(txt)
        return int(f) if f.is_integer() and "." not in txt and "e" not in txt.lower() else f
    except ValueError:
        return txt


def read_xlsx(
    path: str, sheet_name: str | int = 0, header: bool = True
) -> tuple[list[str], list[list]]:
    """Parse one sheet → (column names, rows). With ``header`` the first
    row names the columns; otherwise columns are '0', '1', …"""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        sheets = [
            (s.get("name"), s.get(f"{_REL_NS}id"))
            for s in wb.iter(f"{_NS}sheet")
        ]
        if not sheets:
            raise ValueError(f"{path}: workbook has no sheets")
        if isinstance(sheet_name, int):
            if sheet_name >= len(sheets):
                raise ValueError(
                    f"{path}: sheet index {sheet_name} out of range "
                    f"({len(sheets)} sheets)"
                )
            name, rid = sheets[sheet_name]
        else:
            match = [s for s in sheets if s[0] == sheet_name]
            if not match:
                raise ValueError(
                    f"{path}: no sheet named {sheet_name!r} "
                    f"(available: {[s[0] for s in sheets]})"
                )
            name, rid = match[0]
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        target = None
        for rel in rels.iter(f"{_PKG_REL_NS}Relationship"):
            if rel.get("Id") == rid:
                target = rel.get("Target")
        if target is None:
            raise ValueError(f"{path}: sheet {name!r} has no part target")
        target = re.sub(r"^/?(xl/)?", "xl/", target)

        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in ss.iter(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))

        sheet = ET.fromstring(z.read(target))
        raw_rows: list[list] = []
        width = 0
        for row in sheet.iter(f"{_NS}row"):
            vals: dict[int, object] = {}
            last = -1
            for c in row.iter(f"{_NS}c"):
                ref = c.get("r")
                idx = _col_index(ref) if ref else last + 1
                last = idx
                vals[idx] = _cell_value(c, shared)
            if vals:
                width = max(width, max(vals) + 1)
            raw_rows.append([vals.get(i) for i in range(max(vals, default=-1) + 1)])
        rows = [r + [None] * (width - len(r)) for r in raw_rows]

    if not rows:
        return [], []
    if header:
        cols = [
            str(v) if v is not None else f"col{i}"
            for i, v in enumerate(rows[0])
        ]
        return cols, rows[1:]
    return [str(i) for i in range(width)], rows


# --------------------------------------------------------------- writer

#: the OOXML sheet grid is hard-capped at 2^20 rows (ECMA-376 §18.3.1.73);
#: one header row leaves this many data rows — the cap also bounds driver
#: memory for this inherently single-file, driver-side sink.
XLSX_MAX_DATA_ROWS = 1_048_576 - 1

_XML_ESC = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}


def _esc(s: str) -> str:
    out = []
    for ch in s:
        if ch in _XML_ESC:
            out.append(_XML_ESC[ch])
        elif ch in ("\t", "\n", "\r") or ord(ch) >= 0x20:
            out.append(ch)
        else:
            # control chars are invalid in XML 1.0 — escape like openpyxl
            out.append(f"_x{ord(ch):04X}_")
    return "".join(out)


def _col_letters(i: int) -> str:
    """0 -> 'A', 27 -> 'AB' (inverse of _col_index)."""
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(ord("A") + r) + s
    return s


def _cell_xml(ref: str, v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
    if isinstance(v, (int, float)):
        if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
            # IEEE specials have no OOXML numeric form — write as text,
            # matching what openpyxl shows for inf/nan round-trips
            return (f'<c r="{ref}" t="inlineStr"><is><t>{v}</t></is></c>')
        return f'<c r="{ref}"><v>{v!r}</v></c>'
    text = _esc(str(v))
    sp = ' xml:space="preserve"' if text[:1].isspace() or text[-1:].isspace() else ""
    return f'<c r="{ref}" t="inlineStr"><is><t{sp}>{text}</t></is></c>'


def write_xlsx(
    path: str, cols: list[str], rows: list[list], sheet_name: str = "Sheet1"
) -> None:
    """Write (column names, rows) as a single-sheet .xlsx.

    Strings go as inline strings (no sharedStrings part), numbers as
    native numeric cells, booleans as ``t="b"``; None cells are omitted.
    Everything else is stringified (timestamps surface as their ISO
    ``str()`` — same policy as the reader's no-date-coercion scope). The
    output round-trips through :func:`read_xlsx` and opens in
    Excel/LibreOffice/pandas.
    """
    if len(rows) > XLSX_MAX_DATA_ROWS:
        raise ValueError(
            f"xlsx sheet cap is {XLSX_MAX_DATA_ROWS} data rows, got "
            f"{len(rows)} — write parquet/csv for results this large"
        )
    body = []
    header_cells = "".join(
        _cell_xml(f"{_col_letters(j)}1", str(c)) for j, c in enumerate(cols)
    )
    body.append(f'<row r="1">{header_cells}</row>')
    for i, row in enumerate(rows, start=2):
        cells = "".join(
            _cell_xml(f"{_col_letters(j)}{i}", v) for j, v in enumerate(row)
        )
        body.append(f'<row r="{i}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS[1:-1]}"><sheetData>'
        + "".join(body)
        + "</sheetData></worksheet>"
    )
    ct = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_PKG_REL_NS[1:-1]}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    wb = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS[1:-1]}" xmlns:r="{_REL_NS[1:-1]}">'
        f'<sheets><sheet name="{_esc(sheet_name)}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_PKG_REL_NS[1:-1]}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", rels)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
