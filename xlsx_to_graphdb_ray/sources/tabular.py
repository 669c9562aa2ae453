"""Reference-shaped tabular readers (fixture-compat path).

Re-implements the reference's sheet/CSV parsing semantics over Arrow batches
(SURVEY.md §2.1 S1–S3, §2.2 M1–M4, §2.4 T3):

- case-insensitive column aliasing (``spreadsheet_loader.py:1185-1195``,
  ``:162-179``, ``:268-280``)
- duplicated-header-row promotion (``:62-68``, ``:262-267``)
- required-column gate {Number, Name} (``:65-75``)
- part-row normalization: NaN→None, Source lowercased, number normalization
  (``:98-107``, ``:35-42``)
- part-type classification from sheet name (``:84-96``)
- hierarchical level-stack BOM parse (``:1160-1182``) — the order-coupled
  scan, via per-document sorted groups
- simple parent/child and name-based BOM readers (``:152-192``, ``:254-294``)

These feed the same triple builders as the transcript path; golden-count
tests mirror ``tests/unit/test_spreadsheet_loader.py``.
"""

from __future__ import annotations

import pandas as pd

from ..functions.normalize import normalize_number

PARENT_ALIASES = ("parent number", "parent", "number", "parent part number")
CHILD_ALIASES = ("child number", "child", "component id", "child part number")
PARENT_NAME_ALIASES = ("parent name", "parent")
CHILD_NAME_ALIASES = ("child name", "child")

SHEET_TYPE_MAP = (
    ("mechanicalpart", "MechanicalPart"),
    ("softwarepart", "SoftwarePart"),
    ("variant", "Variant"),
    ("wtpart", "WTPart"),
    ("basicnode", "BasicNode"),
    ("structurenode", "StructureNode"),
)


def classify_sheet(sheet_name: str) -> str | None:
    """Substring-of-sheet-name → part-type enum (ref :84-96)."""
    low = sheet_name.lower()
    for needle, label in SHEET_TYPE_MAP:
        if needle in low:
            return label
    return None


def find_col(columns, aliases) -> str | None:
    """Case-insensitive first-alias-match column lookup (ref :1185-1195)."""
    low = {str(c).strip().lower(): c for c in columns}
    for a in aliases:
        if a in low:
            return low[a]
    return None


def promote_duplicated_header(df: pd.DataFrame,
                              required=("number", "name")) -> pd.DataFrame:
    """If the first data row repeats the header labels, drop it (ref
    :62-68: a duplicated header row inside the data is detected and the real
    data starts after it)."""
    if df.empty:
        return df
    first = {str(v).strip().lower() for v in df.iloc[0].tolist()}
    if set(required).issubset(first):
        return df.iloc[1:].reset_index(drop=True)
    return df


def parse_parts_sheet(df: pd.DataFrame, sheet_name: str = "") -> pd.DataFrame:
    """One parts sheet → normalized entity rows (ref parse_parts :54-111).

    Output columns: number, name, part_type, view, state, source (lowered),
    revision, container. Rows with an empty normalized number are skipped
    (ref :77-79); missing Name falls back to the number later (builder).
    Last-write-wins across sheets is the caller's concat + D2 dedup.
    """
    df = promote_duplicated_header(df)
    num_col = find_col(df.columns, ("number",))
    name_col = find_col(df.columns, ("name",))
    if num_col is None or name_col is None:   # required columns (ref :65-75)
        return pd.DataFrame(columns=["number", "name", "part_type", "view",
                                     "state", "source", "revision",
                                     "container"])
    out = pd.DataFrame({
        "number": df[num_col].map(normalize_number),
        "name": df[name_col].map(
            lambda v: None if pd.isna(v) else str(v)),
    })
    for src_alias, out_col, lower in (
            ("view", "view", False), ("state", "state", False),
            ("source", "source", True), ("revision", "revision", False),
            ("container", "container", False)):
        col = find_col(df.columns, (src_alias,))
        if col is None:
            out[out_col] = None
        else:
            vals = df[col].map(lambda v: None if pd.isna(v) else str(v))
            out[out_col] = vals.str.lower() if lower else vals
    out["part_type"] = classify_sheet(sheet_name)
    out = out[out["number"] != ""].reset_index(drop=True)
    return out[["number", "name", "part_type", "view", "state", "source",
                "revision", "container"]]


def parse_bom_parent_child(df: pd.DataFrame) -> list[tuple[str, str]]:
    """Simple parent/child BOM with aliasing (ref parse_bom_csv :152-192)."""
    df = promote_duplicated_header(df, required=("parent number",)) \
        if find_col(df.columns, PARENT_ALIASES) else df
    p = find_col(df.columns, PARENT_ALIASES)
    c = find_col(df.columns, CHILD_ALIASES)
    if p is None or c is None or p == c:
        return []
    edges = []
    for pv, cv in zip(df[p], df[c]):
        if pd.isna(pv) or pd.isna(cv):      # ref :210-212 NaN guards
            continue
        pn, cn = normalize_number(pv), normalize_number(cv)
        if pn and cn:
            edges.append((pn, cn))
    return edges


def parse_bom_by_name(df: pd.DataFrame) -> list[tuple[str, str]]:
    """Name-based BOM; reversed column order accepted, embedded duplicate
    header dropped (ref parse_bom_csv_by_name :254-294)."""
    p = find_col(df.columns, PARENT_NAME_ALIASES)
    c = find_col(df.columns, CHILD_NAME_ALIASES)
    if p is None or c is None or p == c:
        return []
    out = []
    plow = str(p).strip().lower()
    clow = str(c).strip().lower()
    for pv, cv in zip(df[p], df[c]):
        if pd.isna(pv) or pd.isna(cv):
            continue
        ps, cs = str(pv).strip(), str(cv).strip()
        # embedded duplicate header row (ref :262-267)
        if ps.lower() == plow and cs.lower() == clow:
            continue
        if ps and cs:
            out.append((ps, cs))
    return out


def parse_hierarchical_bom(df: pd.DataFrame) -> list[tuple[str, str]]:
    """Level-stack parse (ref :1160-1182): rows in file order carry a Level;
    each row's parent is the most recent row one level up; deeper stack
    entries are popped when the level decreases."""
    num = find_col(df.columns, ("number",))
    lvl = find_col(df.columns, ("level",))
    if num is None or lvl is None:
        return []
    edges: list[tuple[str, str]] = []
    level_stack: dict[int, str] = {}
    for nv, lv in zip(df[num], df[lvl]):
        if pd.isna(nv) or pd.isna(lv):
            continue
        try:
            level = int(lv)
        except (TypeError, ValueError):
            continue
        part = normalize_number(nv)
        if not part:
            continue
        level_stack[level] = part
        if level > 0 and (level - 1) in level_stack:
            edges.append((level_stack[level - 1], part))
        for deeper in [k for k in level_stack if k > level]:
            del level_stack[deeper]
    return edges
