"""Reference-parity golden-count tests for the tabular import path.

Mirrors the reference's own suite (tests/unit/test_spreadsheet_loader.py):
duplicated-header promotion (:15-32), dry-run counts 6/7 (:81-93),
name-based BOM (:104-109), generate-then-import round trip (:111-136),
ambiguous + strict raise (:164-184), reversed column order (:186-208),
plus the hierarchical level-stack parse (:1160-1182).
"""

import pandas as pd
import pytest

from xlsx_to_graphdb_ray.pipelines import tabular_kg as tk
from xlsx_to_graphdb_ray.sources import tabular as tab


def _sheet():
    # duplicated header row inside the data, numeric part numbers
    return pd.DataFrame({0: ["Number", 111, 222],
                         1: ["Name", "Frame", "Ski"]}) \
        .rename(columns={0: "Number", 1: "Name"})


def test_duplicated_header_promotion():
    df = tab.promote_duplicated_header(_sheet())
    assert df["Number"].tolist() == [111, 222]


def test_parse_parts_normalizes_numbers():
    out = tab.parse_parts_sheet(_sheet(), "MechanicalPart-Sheet")
    assert out["number"].tolist() == ["111", "222"]
    assert out["part_type"].tolist() == ["MechanicalPart"] * 2


def test_two_parts_six_triples(ray_session):
    ds, stats = tk.import_tabular({"Sheet1": _sheet()})
    assert stats["n_triples"] == 6  # 2 parts × (rdf:type, ont:name, label)
    assert ds.count() == 6


def test_bom_adds_one_triple(ray_session):
    bom = pd.DataFrame({"Number": [111], "Component Id": [222]})
    ds, stats = tk.import_tabular({"Sheet1": _sheet()}, bom)
    assert stats["n_triples"] == 7
    df = ds.to_pandas()
    comp = df[df["pred"].str.endswith("hasComponent")]
    assert comp["subj"].tolist() == ["urn:part:111"]
    assert comp["obj"].tolist() == ["urn:part:222"]


def test_bom_by_name(ray_session):
    bom = pd.DataFrame({"Parent Name": ["Frame"], "Child Name": ["Ski"]})
    _, stats = tk.import_tabular({"Sheet1": _sheet()}, bom, bom_by_name=True)
    assert stats["n_triples"] == 7


def test_bom_by_name_reversed_columns(ray_session):
    bom = pd.DataFrame({"Child Name": ["Ski"], "Parent Name": ["Frame"]})
    _, stats = tk.import_tabular({"Sheet1": _sheet()}, bom, bom_by_name=True)
    assert stats["n_edges"] == 1


def test_generate_bom_by_name_round_trip(ray_session):
    parts = tk.build_part_table({"Sheet1": _sheet()})
    gen = tk.generate_bom_by_name(parts, [("111", "222")])
    assert gen.iloc[0].tolist() == ["Frame", "Ski"]
    _, stats = tk.import_tabular({"Sheet1": _sheet()}, gen, bom_by_name=True)
    assert stats["n_triples"] == 7


def test_ambiguous_name_strict_raises(ray_session):
    sheet = pd.DataFrame({"Number": [1, 2], "Name": ["Dup", "Dup"]})
    bom = pd.DataFrame({"Parent Name": ["Dup"], "Child Name": ["Dup"]})
    with pytest.raises(RuntimeError, match="Ambiguous"):
        tk.import_tabular({"S": sheet}, bom, bom_by_name=True,
                          strict_names=True)
    # non-strict: skipped, recorded in the resolution report (J2)
    _, stats = tk.import_tabular({"S": sheet}, bom, bom_by_name=True)
    assert stats["n_edges"] == 0
    assert stats["resolution_report"] == [("Dup", "Dup", "ambiguous")]


def test_number_fallback_resolution():
    resolved, report = tk.resolve_edges_by_name(
        [("111", "Ski")], {"Ski": ["222"]}, {"111", "222"})
    assert resolved == [("111", "222")]


def test_hierarchical_level_stack():
    # depth 3, shared subtree, level jump down by >1 (FIXTURES.md §2.2)
    bom = pd.DataFrame({
        "Number": ["A", "B", "C", "D", "B2", "C"],
        "Level": [0, 1, 2, 3, 1, 2],
    })
    edges = tab.parse_hierarchical_bom(bom)
    assert edges == [("A", "B"), ("B", "C"), ("C", "D"),
                     ("A", "B2"), ("B2", "C")]


def test_derived_edges_opt_in(ray_session):
    bom = pd.DataFrame({"Number": [111], "Component Id": [222]})
    ds, stats = tk.import_tabular({"Sheet1": _sheet()}, bom,
                                  include_derived=True)
    df = ds.to_pandas()
    assert (df["pred"].str.endswith("usedIn")).sum() == 1
    assert (df["pred"].str.endswith("partOfAssembly")).sum() == 1
    assert stats["n_triples"] == 9


def test_last_wins_across_sheets():
    s1 = pd.DataFrame({"Number": [111], "Name": ["Old"]})
    s2 = pd.DataFrame({"Number": [111], "Name": ["New"]})
    parts = tk.build_part_table({"A": s1, "B": s2})
    assert parts["name"].tolist() == ["New"]


def test_stub_missing_entities():
    parts = tk.build_part_table({"Sheet1": _sheet()})
    out = tk.stub_missing_entities(parts, [("111", "999")])
    stub = out[out["number"] == "999"]
    assert stub["part_type"].tolist() == ["MissingPart"]
    assert stub["name"].tolist() == ["999"]
    # no-op when all endpoints known
    assert len(tk.stub_missing_entities(parts, [("111", "222")])) == len(parts)


def test_display_enrichment():
    parts = pd.DataFrame({
        "number": ["1", "2", "3"],
        "name": ["a", "b", "c"],
        "part_type": ["MechanicalPart", None, None],
        "view": ["Design", None, None],
        "state": ["RELEASED", None, None],
        "source": [None, "buy", None],
        "revision": ["A", None, None],
        "container": [None, None, None],
    })
    out = tk.enrich_display(parts)
    assert out["display_color"].tolist() == ["#2e7d32", "#ef6c00", "#9e9e9e"]
    assert out["display_size"].tolist() == [30 + 5 * 3, 30 + 5, 30]


def test_uri_quoting(ray_session):
    sheet = pd.DataFrame({"Number": ["100 SNOW"], "Name": ["Root"]})
    ds, _ = tk.import_tabular({"S": sheet})
    assert ds.to_pandas()["subj"].iloc[0] == "urn:part:100%20SNOW"


# ---------------------------------------------------------------------------
# S5 — MCP/JSON-RPC change source (local transport, fallback semantics)
# ---------------------------------------------------------------------------

def _write_json(root, route, query, payload):
    import json
    import os
    d = os.path.join(root, route)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"{query}.json"), "w") as f:
        json.dump(payload, f)


def test_changes_rpc_fallback_chain_and_fanout(ray_session, tmp_path):
    """Route fallback per the reference chain: P1 answers on the JSON-RPC
    route, P2 only on tools_call, P3 only on legacy change_search; detail
    enrichment coalesces case-variant fields; AffectedObjects fan out."""
    import pandas as pd
    import ray.data

    from xlsx_to_graphdb_ray.sources.changes_rpc import fetch_changes

    ep = str(tmp_path / "ep1")
    # P1: primary JSON-RPC route
    _write_json(ep, "message", "P1",
                {"result": {"results": [{"oid": "C1"}]}})
    _write_json(ep, "message", "C1",
                {"result": {"number": "ECN-100", "Type": "ChangeOrder",
                            "state": "RELEASED", "name": "fix",
                            "AffectedObjects": [{"number": "P1"},
                                                {"Number": "P9"}]}})
    # P2: message route missing → tools_call answers; no detail anywhere
    _write_json(ep, "tools_call", "P2", {"results": [{"id": "C2"}]})
    # P3: only the legacy route answers, items under "data"
    _write_json(ep, "change_search", "P3", {"data": [{"oid": "C3"}]})
    _write_json(ep, "message", "C3",
                {"result": {"Number": "ECN-300", "state": "INWORK"}})

    parts = ray.data.from_pandas(pd.DataFrame({
        "number": ["P1", "P2", "P3", "P4"],      # P4: no change anywhere
        "container": ["A", "B", "C", "D"]}))
    out = fetch_changes(parts, [str(tmp_path / "missing"), ep]) \
        .to_pandas().sort_values(["number", "part"]).reset_index(drop=True)

    # P1's change fans out to both affected parts, detail fields win
    p1 = out[out["number"] == "ECN-100"]
    assert sorted(p1["part"]) == ["P1", "P9"]
    assert set(p1["type"]) == {"ChangeOrder"}
    assert set(p1["state"]) == {"RELEASED"}
    # P9 is not in the parts batch → container falls back to P1's
    assert sorted(p1["container"]) == ["A", "A"]
    # P2: detail chain found nothing carrying a number → defaults
    p2 = out[out["part"] == "P2"]
    assert list(p2["number"]) == ["ECN-P2"]
    assert list(p2["type"]) == ["ChangeNotice"]
    assert list(p2["state"]) == ["INWORK"]
    # P3: legacy search route + detail coalesces capitalized Number
    p3 = out[out["part"] == "P3"]
    assert list(p3["number"]) == ["ECN-300"]
    # P4: silent skip, like the reference
    assert (out["part"] == "P4").sum() == 0
    assert len(out) == 4
