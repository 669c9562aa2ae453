"""Raw ``.xlsx`` container reader (and a minimal writer) on the stdlib.

The reference opens actual workbooks via ``pd.read_excel``
(``spreadsheet_loader.py:50-68``: ``skiprows=4`` first, retry without
skiprows when that yields an empty frame, then duplicated-header promotion
and the {Number, Name} required-column gate). openpyxl is absent in this
environment, but xlsx is just a zip of XML parts — this module parses the
container directly with ``zipfile`` + ``xml.etree``:

- sheet enumeration from ``xl/workbook.xml`` (name → r:id), resolved to
  part paths through ``xl/_rels/workbook.xml.rels``
- cells from ``xl/worksheets/sheet*.xml`` (``<row r=..><c r=.. t=..>``),
  supporting shared strings (``t="s"`` → ``xl/sharedStrings.xml``, incl.
  rich-text runs), inline strings (``t="inlineStr"``), booleans, formula
  string results (``t="str"``), errors (→ None) and numbers (int when
  integral, mirroring what ``pd.read_excel`` hands the reference)
- number *formats* are deliberately NOT interpreted (no date coercion):
  the reference's workbooks are string-typed part tables, and its own
  ``normalize_part_number`` handles the int/float/str cases downstream

Scale note: workbooks are the reference's SMALL-side input (part masters,
BOM sheets — thousands of rows), parsed once on the driver or inside one
task and then broadcast; the 100 TB path is the transcript Parquet tables.
``read_workbook`` therefore returns plain pandas frames that feed
``pipelines.tabular_kg.import_tabular`` unchanged.

The writer (``write_xlsx``) emits a spec-minimal workbook (inline strings,
no styles) with the same zip/XML primitives — used by the golden-count
round-trip tests, mirroring the reference's ``_make_excel`` fixture
(``tests/unit/test_spreadsheet_loader.py:59-68``).
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd

_NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_PKGREL = "http://schemas.openxmlformats.org/package/2006/relationships"
_M = "{%s}" % _NS_MAIN
_CELL_REF = re.compile(r"([A-Z]+)(\d+)$")


def _col_index(letters: str) -> int:
    """'A' → 0, 'Z' → 25, 'AA' → 26 ... (base-26 bijective)."""
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _col_letters(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _si_text(si: ET.Element) -> str:
    """One <si> shared-string item → text (plain <t> or rich-text runs)."""
    return "".join(t.text or "" for t in si.iter(_M + "t"))


def _sheet_targets(z: zipfile.ZipFile) -> list[tuple[str, str]]:
    """Ordered (sheet_name, zip_member_path) pairs from workbook + rels."""
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        r.get("Id"): r.get("Target")
        for r in rels.iter("{%s}Relationship" % _NS_PKGREL)}
    out = []
    for sh in wb.iter(_M + "sheet"):
        rid = sh.get("{%s}id" % _NS_REL)
        target = rid_to_target.get(rid, "")
        if not target:
            continue
        # targets are relative to xl/ unless absolute ("/xl/...")
        member = target.lstrip("/") if target.startswith("/") \
            else "xl/" + target
        out.append((sh.get("name"), member))
    return out


def sheet_names(path: str) -> list[str]:
    """Workbook sheet names, in workbook order (ref ``get_sheet_names``,
    spreadsheet_loader.py:50-52)."""
    with zipfile.ZipFile(path) as z:
        return [name for name, _ in _sheet_targets(z)]


def _parse_cell(c: ET.Element, sst: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(_M + "is")
        return _si_text(is_el) if is_el is not None else None
    v = c.find(_M + "v")
    if v is None or v.text is None:
        return None
    raw = v.text
    if t == "s":
        return sst[int(raw)]
    if t == "str":
        return raw
    if t == "b":
        return bool(int(raw))
    if t == "e":
        return None
    # numeric: int when integral (what read_excel hands the reference's
    # normalize_part_number — it sees 111, not "111.0")
    f = float(raw)
    return int(f) if f.is_integer() else f


def _read_grid(z: zipfile.ZipFile, member: str,
               sst: list[str]) -> tuple[dict[tuple[int, int], object], int, int]:
    """One worksheet part → sparse {(row0, col0): value} + grid extent."""
    root = ET.fromstring(z.read(member))
    cells: dict[tuple[int, int], object] = {}
    max_r = max_c = -1
    row_no = 0
    for row in root.iter(_M + "row"):
        r_attr = row.get("r")
        row_no = int(r_attr) if r_attr else row_no + 1
        r0 = row_no - 1
        col_no = -1
        for c in row.iter(_M + "c"):
            ref = c.get("r")
            if ref:
                m = _CELL_REF.match(ref)
                col_no = _col_index(m.group(1)) if m else col_no + 1
            else:
                col_no += 1
            val = _parse_cell(c, sst)
            if val is not None and val != "":
                cells[(r0, col_no)] = val
                if r0 > max_r:
                    max_r = r0
                if col_no > max_c:
                    max_c = col_no
    return cells, max_r + 1, max_c + 1


def read_sheet(path: str, sheet_name: str, *,
               skiprows: int = 0) -> pd.DataFrame:
    """One sheet → DataFrame with ``pd.read_excel(skiprows=...)`` header
    semantics: skip ``skiprows`` grid rows, next row is the header, rest is
    data (object dtype; unlabeled header cells become ``Unnamed: i``).
    Fully-empty data rows are dropped (the part parsers skip them anyway;
    ref :77-79 skips empty part numbers row-by-row)."""
    with zipfile.ZipFile(path) as z:
        sst: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = [_si_text(si)
                   for si in ET.fromstring(z.read("xl/sharedStrings.xml"))
                   .iter(_M + "si")]
        target = dict(_sheet_targets(z)).get(sheet_name)
        if target is None:
            raise KeyError(f"sheet {sheet_name!r} not in workbook "
                           f"{sheet_names(path)}")
        cells, n_rows, n_cols = _read_grid(z, target, sst)
    if n_rows <= skiprows or n_cols == 0:
        return pd.DataFrame()
    header = [cells.get((skiprows, c)) for c in range(n_cols)]
    columns = [str(h) if h is not None else f"Unnamed: {c}"
               for c, h in enumerate(header)]
    data = []
    for r in range(skiprows + 1, n_rows):
        row = [cells.get((r, c)) for c in range(n_cols)]
        if any(v is not None for v in row):
            data.append(row)
    return pd.DataFrame(data, columns=columns, dtype=object)


def read_workbook(path: str,
                  sheets: list[str] | None = None) -> dict[str, pd.DataFrame]:
    """Whole workbook with the reference's read protocol per sheet
    (ref parse_parts :56-60): try ``skiprows=4``; if that yields an empty
    frame, re-read from the top. Header promotion / required-column gating
    stays downstream in ``sources.tabular`` (shared with the fixture path).
    """
    out: dict[str, pd.DataFrame] = {}
    for name in (sheets or sheet_names(path)):
        df = read_sheet(path, name, skiprows=4)
        if df.empty or len(df.columns) == 0:
            df = read_sheet(path, name, skiprows=0)
        out[name] = df
    return out


def import_xlsx(path: str, bom_df: pd.DataFrame | None = None, **kwargs):
    """Raw workbook → (triples Dataset, stats): the reference's
    ``import_data(excel_path, ...)`` entry re-expressed over the container
    reader + the shared ``import_tabular`` builder."""
    from ..pipelines.tabular_kg import import_tabular
    return import_tabular(read_workbook(path), bom_df, **kwargs)


# ---------------------------------------------------------------- writer --

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '{overrides}</Types>')
_SHEET_OVERRIDE = (
    '<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
    'worksheet+xml"/>')
_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="%s">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="xl/workbook.xml"/></Relationships>' % _NS_PKGREL)


def _cell_xml(ref: str, val) -> str:
    if val is None or (isinstance(val, float) and val != val):
        return ""
    if isinstance(val, bool):
        return f'<c r="{ref}" t="b"><v>{int(val)}</v></c>'
    if isinstance(val, (int, float)):
        return f'<c r="{ref}"><v>{val}</v></c>'
    return (f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
            f'{escape(str(val))}</t></is></c>')


def write_xlsx(path: str, sheets: dict[str, pd.DataFrame], *,
               header: bool = True) -> str:
    """Minimal spec-valid workbook writer (inline strings, no styles/shared
    strings): the test-side counterpart of the reader, built from the same
    zip/XML primitives. ``header=False`` writes data rows only (the
    reference fixture writes its header as a data row — ref test :59-68)."""
    names = list(sheets)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES.format(
            overrides="".join(_SHEET_OVERRIDE.format(i=i + 1)
                              for i in range(len(names)))))
        z.writestr("_rels/.rels", _ROOT_RELS)
        sheet_tags = "".join(
            f'<sheet name="{escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names))
        z.writestr("xl/workbook.xml", (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<workbook xmlns="{_NS_MAIN}" xmlns:r="{_NS_REL}">'
            f'<sheets>{sheet_tags}</sheets></workbook>'))
        rels = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/worksheet"'
            f' Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names)))
        z.writestr("xl/_rels/workbook.xml.rels", (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{_NS_PKGREL}">{rels}</Relationships>'))
        for i, n in enumerate(names):
            df = sheets[n]
            rows_xml = []
            grid = ([list(df.columns)] if header else []) + \
                df.values.tolist()
            for r, row in enumerate(grid, start=1):
                cells = "".join(
                    _cell_xml(f"{_col_letters(c)}{r}", v)
                    for c, v in enumerate(row))
                rows_xml.append(f'<row r="{r}">{cells}</row>')
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", (
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<worksheet xmlns="{_NS_MAIN}">'
                f'<sheetData>{"".join(rows_xml)}</sheetData></worksheet>'))
    return path
