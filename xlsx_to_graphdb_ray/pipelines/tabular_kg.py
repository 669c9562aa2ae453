"""Reference-parity tabular import: parts sheets + BOM → triples.

The fixture-compat re-expression of ``import_data``
(``spreadsheet_loader.py:1355-1524``): parse sheets → cross-index (D2
last-wins) → resolve BOM (by number or by name, reference-exact strip-only
matching, strict gate) → triples in the reference's ``urn:part:`` URI scheme
(percent-encoded ids, ref :881). Derived edges (usedIn F3, partOfAssembly
closure A6) are opt-in, mirroring the reference's dry-run counts
(tests/unit/test_spreadsheet_loader.py:81-93: 2 parts → 6, +1 edge → 7).

Input sheets are plain DataFrames (the Excel container format is out of
scope in this environment — openpyxl isn't installed; the semantics under
test start AFTER ``pd.read_excel``, cf. SURVEY.md §2.1 S1).
"""

from __future__ import annotations

from urllib.parse import quote

import pandas as pd
import ray.data

from ..config import tune_context
from ..sources import tabular as tab
from ..stages import triples as T
from ..stages.closure import closure_pandas

PART_NS = "urn:part:"


def build_part_table(sheets: dict[str, pd.DataFrame]) -> pd.DataFrame:
    """Parse + union all sheets; D2 last-wins on number across sheets
    (ref ``parts[number] = {...}`` overwrite, :98)."""
    frames = []
    for order, (sheet_name, df) in enumerate(sheets.items()):
        p = tab.parse_parts_sheet(df, sheet_name)
        p["__order"] = order
        frames.append(p)
    if not frames:
        return pd.DataFrame()
    allp = pd.concat(frames, ignore_index=True)
    allp = allp.sort_values("__order", kind="mergesort") \
        .drop_duplicates("number", keep="last") \
        .drop(columns="__order").reset_index(drop=True)
    return allp


def build_name_index(parts: pd.DataFrame):
    """pn_to_name / name_to_pn (ref build_name_index :1041-1052):
    name = str(name or number).strip(); strip-only exact matching."""
    pn_to_name, name_to_pn = {}, {}
    for pn, nm in zip(parts["number"], parts["name"]):
        name = str(nm if nm is not None and not pd.isna(nm) else pn).strip()
        pn_to_name[pn] = name
        name_to_pn.setdefault(name, []).append(pn)
    return pn_to_name, name_to_pn


def resolve_edges_by_name(name_edges, name_to_pn, parts_set,
                          strict: bool = False):
    """Reference-exact J1 (ref :1055-1080): strip, empty-candidates →
    number fallback, ambiguous/unknown skipped (or strict raise).
    Returns (resolved_edges, report_rows)."""
    resolved, report = [], []
    for p_name, c_name in name_edges:
        pk, ck = (p_name or "").strip(), (c_name or "").strip()
        p_list = name_to_pn.get(pk)
        c_list = name_to_pn.get(ck)
        if not p_list and pk in parts_set:
            p_list = [pk]
        if not c_list and ck in parts_set:
            c_list = [ck]
        if not p_list or not c_list:
            if strict:
                raise RuntimeError(
                    f"Unknown part name in BOM: {p_name} or {c_name}")
            report.append((p_name, c_name, "unknown"))
            continue
        if len(p_list) != 1 or len(c_list) != 1:
            if strict:
                raise RuntimeError(
                    f"Ambiguous part name in BOM: {p_name} or {c_name}")
            report.append((p_name, c_name, "ambiguous"))
            continue
        resolved.append((p_list[0], c_list[0]))
        report.append((p_name, c_name, "resolved"))
    return resolved, report


def import_tabular(sheets: dict[str, pd.DataFrame],
                   bom_df: pd.DataFrame | None = None, *,
                   bom_by_name: bool = False,
                   hierarchical: bool = False,
                   strict_names: bool = False,
                   include_derived: bool = False):
    """parts sheets (+ optional BOM) → (triples Dataset, stats dict)."""
    tune_context()
    parts = build_part_table(sheets)
    pn_to_name, name_to_pn = build_name_index(parts)
    parts_set = set(parts["number"])

    edges: list[tuple[str, str]] = []
    report = []
    if bom_df is not None:
        if hierarchical:
            edges = tab.parse_hierarchical_bom(bom_df)
        elif bom_by_name:
            name_edges = tab.parse_bom_by_name(bom_df)
            edges, report = resolve_edges_by_name(
                name_edges, name_to_pn, parts_set, strict=strict_names)
        else:
            edges = tab.parse_bom_parent_child(bom_df)
    # D1 first-wins order-preserving dedup (ref :1221)
    edges = list(dict.fromkeys(edges))

    qparts = parts.copy()
    qparts["qnum"] = qparts["number"].map(lambda s: quote(str(s)))
    ent_batch = pd.DataFrame({
        "canon_id": qparts["qnum"],
        "prov": "",
        "name": qparts["name"],
        "part_type": qparts["part_type"],
        "view": qparts["view"],
        "state": qparts["state"],
        "source": qparts["source"],
        "revision": qparts["revision"],
        "container": qparts["container"],
    })
    # name fallback: Literal(name or part_number) — the UNQUOTED number
    ent_batch["name"] = ent_batch["name"].fillna(parts["number"])
    frames = [T.entity_triples_batch(ent_batch, ns=PART_NS,
                                     type_label="Part")]

    if edges:
        edf = pd.DataFrame(edges, columns=["parent", "child"])
        edf["parent"] = edf["parent"].map(lambda s: quote(str(s)))
        edf["child"] = edf["child"].map(lambda s: quote(str(s)))
        rel = pd.DataFrame({
            "pred": "hasComponent",
            "a_canon": edf["parent"],
            "b_canon": edf["child"],
            "prov": "",
        })
        if include_derived:
            frames.append(T.relation_triples_batch(rel).assign())
            paths = closure_pandas(edf)
            frames.append(T.closure_triples_batch(
                paths.rename(columns={"anc": "anc", "desc": "desc"})))
        else:
            direct = T.relation_triples_batch(rel)
            frames.append(direct[direct["pred"] != T.ONT + "usedIn"])

    allt = pd.concat(frames, ignore_index=True)[T.TRIPLE_COLS]
    # URI namespace fix for relation/closure builders (they emit urn:entity:)
    for col in ("subj", "obj"):
        allt[col] = allt[col].str.replace(T.ENTITY_NS, PART_NS, regex=False)
    ds = ray.data.from_pandas(allt.reset_index(drop=True))
    stats = {
        "n_parts": len(parts),
        "n_edges": len(edges),
        "n_triples": len(allt),
        "resolution_report": report,
        "pn_to_name": pn_to_name,
    }
    return ds, stats


def stub_missing_entities(parts: pd.DataFrame,
                          edges: list[tuple[str, str]]) -> pd.DataFrame:
    """D5 (ref :672-679, :744-748): BOM endpoints absent from the parts
    table become MissingPart stub rows — the anti-join + union that replaces
    Cypher MERGE auto-creation."""
    known = set(parts["number"])
    missing = sorted({x for e in edges for x in e} - known)
    if not missing:
        return parts
    stubs = pd.DataFrame({
        "number": missing, "name": missing,
        "part_type": "MissingPart", "view": None, "state": None,
        "source": None, "revision": None, "container": None,
    })
    return pd.concat([parts, stubs], ignore_index=True)


STATE_COLORS = {"RELEASED": "#2e7d32", "DESIGN": "#1565c0",
                "INPLANNING": "#f9a825"}
SOURCE_COLORS = {"make": "#6a1b9a", "buy": "#ef6c00"}
TYPE_COLORS = {"MechanicalPart": "#455a64", "SoftwarePart": "#00838f"}
DEFAULT_COLOR = "#9e9e9e"


def enrich_display(parts: pd.DataFrame) -> pd.DataFrame:
    """M11 (ref :538-599): display color by state > source > type priority;
    node size = 30 + 5 × metadata-field count."""
    meta_cols = ["view", "state", "source", "revision", "container"]

    def color(row) -> str:
        return (STATE_COLORS.get(row["state"])
                or SOURCE_COLORS.get(row["source"])
                or TYPE_COLORS.get(row["part_type"])
                or DEFAULT_COLOR)

    out = parts.copy()
    out["display_color"] = parts.apply(color, axis=1)
    out["display_size"] = 30 + 5 * parts[meta_cols].notna().sum(axis=1)
    return out


def generate_bom_by_name(parts: pd.DataFrame,
                         edges: list[tuple[str, str]]) -> pd.DataFrame:
    """J3 number→name enrichment with identity fallback (ref
    generate_bom_by_name_file :1109-1121)."""
    pn_to_name, _ = build_name_index(parts)
    rows = [(pn_to_name.get(p, p), pn_to_name.get(c, c)) for p, c in edges]
    return pd.DataFrame(rows, columns=["Parent Name", "Child Name"])
