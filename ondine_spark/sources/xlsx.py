"""Minimal dependency-free .xlsx reader (S4 fallback).

An .xlsx file is a zip of OOXML parts; the subset a data pipeline needs —
shared strings, inline strings, numbers, booleans, pick-a-sheet — parses
with stdlib ``zipfile`` + ``ElementTree``. The reference tests Excel
ingestion for real (tests/verification/test_verify_data_formats.py) via
pandas+openpyxl; this module makes the same path work where openpyxl is
not installable, with pandas+openpyxl still preferred when present
(sources/readers.py tries it first).

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
