"""Minimal stdlib xlsx codec (zipfile + xml.etree) — the fallback
engine behind the Excel source/sinks when openpyxl is absent.

An .xlsx file is a zip of XML parts (ECMA-376 / ISO 29500
SpreadsheetML, public spec). This shim implements exactly the subset
the reference exercises (``timesheet_transform.py:21``, ``:105-138``,
``timesheet_transform_v1.py:92-100``):

- read: every worksheet, header row 1, cell types inline-string /
  shared-string / number / bool / formula-cached-string; styles and
  formatting are ignored on read.
- write: one worksheet per sheet, header row, values as inline
  strings / numbers / bools (no sharedStrings table, no styling).

It is NOT a general Excel implementation — no formulas, merged cells,
charts, or 1904 date system. Dates are carried as ISO strings, which
the engine's merge path already parses at day granularity (P6 / J2
semantics). openpyxl, when present, remains the preferred engine and
the only one that preserves formatting on in-place update.
"""

from __future__ import annotations

import math
import os
import re
import xml.etree.ElementTree as ET
import zipfile
from collections.abc import Sequence

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_NS_PKG_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_CELL_REF = re.compile(r"([A-Z]+)([0-9]+)")


def _col_index(ref: str) -> int:
    """'A'->0, 'B'->1, ... 'AA'->26 (cell column letters, base-26)."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _col_letters(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


# ---------------------------------------------------------------------------
# read
# ---------------------------------------------------------------------------


def _parse_shared_strings(data: bytes) -> list[str]:
    root = ET.fromstring(data)
    out = []
    for si in root.findall(f"{_NS}si"):
        # A shared string may be a single <t> or rich-text <r> runs.
        parts = [t.text or "" for t in si.iter(f"{_NS}t")]
        out.append("".join(parts))
    return out


def _cell_value(cell: ET.Element, shared: list[str]):
    ctype = cell.get("t", "n")
    v = cell.find(f"{_NS}v")
    if ctype == "inlineStr":
        is_el = cell.find(f"{_NS}is")
        if is_el is None:
            return None
        return "".join(t.text or "" for t in is_el.iter(f"{_NS}t"))
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "b":
        return v.text == "1"
    if ctype == "str":  # formula cached string
        return v.text
    # numeric: int when exact, else float (mirrors pandas' inference
    # closely enough for the engine's string/double typing)
    f = float(v.text)
    return int(f) if f.is_integer() and abs(f) < 2**53 else f


def read_workbook(path: str) -> dict[str, tuple[list[str], list[list]]]:
    """Parse an xlsx into {sheet name: (header, data rows)}.

    Header is row 1 (the reference's assumption,
    ``timesheet_transform.py:115``); data rows are padded/truncated to
    the header width; rows beyond the last header column are dropped.
    """
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            shared = _parse_shared_strings(zf.read("xl/sharedStrings.xml"))

        # sheet name -> target part, via workbook rels
        rels = {}
        if "xl/_rels/workbook.xml.rels" in names:
            for rel in ET.fromstring(zf.read("xl/_rels/workbook.xml.rels")):
                target = rel.get("Target", "")
                if target.startswith("/"):
                    target = target.lstrip("/")
                else:
                    target = "xl/" + target
                rels[rel.get("Id")] = os.path.normpath(target).replace("\\", "/")

        out: dict[str, tuple[list[str], list[list]]] = {}
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        sheets_el = wb.find(f"{_NS}sheets")
        for i, sheet in enumerate(sheets_el or []):
            sheet_name = sheet.get("name", f"Sheet{i + 1}")
            rid = sheet.get(f"{_NS_REL}id")
            part = rels.get(rid, f"xl/worksheets/sheet{i + 1}.xml")
            if part not in names:
                continue
            ws = ET.fromstring(zf.read(part))
            rows: dict[int, dict[int, object]] = {}
            prev_row = -1
            for row in ws.iter(f"{_NS}row"):
                # a declared row with no (non-empty) cells is still a
                # row — interior blank rows must survive a round-trip.
                r_attr = row.get("r")
                row_idx = int(r_attr) - 1 if r_attr else prev_row + 1
                prev_row = row_idx
                rows.setdefault(row_idx, {})
                for cell in row.findall(f"{_NS}c"):
                    ref = cell.get("r")
                    if ref is None:
                        continue
                    m = _CELL_REF.fullmatch(ref)
                    if m is None:
                        continue
                    c_idx = _col_index(m.group(1))
                    r_idx = int(m.group(2)) - 1
                    val = _cell_value(cell, shared)
                    if val is not None:
                        rows.setdefault(r_idx, {})[c_idx] = val
            header_cells = rows.pop(0, {})
            if not header_cells:
                out[sheet_name] = ([], [])
                continue
            width = max(header_cells) + 1
            header = [str(header_cells.get(c, f"col{c}")) for c in range(width)]
            data = [
                [rows[r].get(c) for c in range(width)] for r in sorted(rows)
            ]
            out[sheet_name] = (header, data)
        return out


# ---------------------------------------------------------------------------
# write
# ---------------------------------------------------------------------------

_CONTENT_TYPES_TMPL = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>{overrides}'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns='
    '"http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="xl/workbook.xml"/></Relationships>'
)


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        if isinstance(value, float) and not math.isfinite(value):
            # SpreadsheetML numeric cells cannot carry NaN/Infinity —
            # Excel rejects <v>nan</v>. Match the pandas/openpyxl
            # engine cell-for-cell: NaN becomes an EMPTY cell (pandas
            # na_rep=''), ±inf become inline strings (pandas
            # inf_rep='inf'), so workbook content does not depend on
            # which engine happens to be installed.
            if math.isnan(value):
                return ""
            return (
                f'<c r="{ref}" t="inlineStr"><is>'
                f"<t>{'-inf' if value < 0 else 'inf'}</t></is></c>"
            )
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    if not isinstance(value, str):
        # dates/datetimes/decimals arrive here: carried as ISO-ish text
        value = str(value)
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{_xml_escape(value)}</t></is></c>'


def _sheet_xml(header: Sequence[str], rows: Sequence[Sequence]) -> str:
    parts = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns='
        '"http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
    ]
    all_rows = [list(header)] + [list(r) for r in rows]
    for r_idx, row in enumerate(all_rows, start=1):
        cells = "".join(
            _cell_xml(f"{_col_letters(c)}{r_idx}", v) for c, v in enumerate(row)
        )
        parts.append(f'<row r="{r_idx}">{cells}</row>')
    parts.append("</sheetData></worksheet>")
    return "".join(parts)


def write_workbook(
    path: str, sheets: dict[str, tuple[Sequence[str], Sequence[Sequence]]]
) -> None:
    """Write {sheet name: (header, rows)} as a minimal valid xlsx.

    Deterministic output: fixed zip entry timestamps, sheets in dict
    order. Sheet names are used verbatim — callers enforce Excel's
    31-char cap (``timesheet_transform_v1.py:99``) before calling.
    """
    if not sheets:
        raise ValueError("write_workbook: no sheets")
    sheet_names = list(sheets)
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/>'
        for i in range(len(sheet_names))
    )
    sheets_el = "".join(
        f'<sheet name="{_xml_escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(sheet_names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns='
        '"http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        f'relationships"><sheets>{sheets_el}</sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns='
        '"http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/worksheet"
            f'" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheet_names))
        )
        + "</Relationships>"
    )
    fixed_date = (1980, 1, 1, 0, 0, 0)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:

        def add(name: str, data: str) -> None:
            zf.writestr(zipfile.ZipInfo(name, date_time=fixed_date), data)

        add("[Content_Types].xml", _CONTENT_TYPES_TMPL.format(overrides=overrides))
        add("_rels/.rels", _ROOT_RELS)
        add("xl/workbook.xml", workbook)
        add("xl/_rels/workbook.xml.rels", wb_rels)
        for i, name in enumerate(sheet_names):
            header, rows = sheets[name]
            add(f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(header, rows))
