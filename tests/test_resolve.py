"""Resolution semantics parity (ref resolve_edges_by_name :1055-1080)."""

import pandas as pd
import pytest

from xlsx_to_graphdb_ray.stages.resolve import Resolver, _resolve_series

LOOKUPS = {
    "name_to_ids": {
        "alpha rotor 1": ["P1"],
        "twin thing": ["P2", "P3"],          # ambiguous
        "100042": ["P4"],                     # numeric name
    },
    "id_map": {"p1": "P1", "p2": "P2", "p3": "P3", "p4": "P4"},
}


def test_statuses():
    alias = pd.Series([
        " Alpha Rotor 1 ",   # resolved (trim+case)
        "TWIN THING",        # ambiguous (2 candidates, NO fallback)
        "ghost item 7",      # unknown
        "P2",                # number-fallback (empty candidates → id match)
        "100042.0",          # float-collapse → numeric name
    ])
    eid, status, ncand = _resolve_series(
        alias, LOOKUPS["name_to_ids"], LOOKUPS["id_map"])
    assert status.tolist() == [
        "resolved", "ambiguous", "unknown", "resolved", "resolved"]
    assert eid.tolist() == ["P1", None, None, "P2", "P4"]
    assert ncand.tolist() == [1, 2, 0, 0, 1]


def test_ambiguous_never_falls_back():
    """Reference only falls back when the candidate list is EMPTY
    (spreadsheet_loader.py:1063-1066)."""
    lk = {"name_to_ids": {"p9": ["Pa", "Pb"]}, "id_map": {"p9": "P9"}}
    eid, status, _ = _resolve_series(
        pd.Series(["P9"]), lk["name_to_ids"], lk["id_map"])
    assert status.tolist() == ["ambiguous"]
    assert eid.tolist() == [None]


def test_resolver_batch_tool_passthrough():
    r = Resolver(LOOKUPS)
    batch = pd.DataFrame({
        "conv_id": ["c1", "c1"],
        "turn_idx": [0, 1],
        "ord": [0, 0],
        "kind": ["r", "t"],
        "a": ["alpha rotor 1", "search"],
        "b": ["TWIN THING", None],
        "pred": ["hasComponent", "usedTool"],
    })
    out = r(batch)
    assert out.loc[0, "a_status"] == "resolved"
    assert out.loc[0, "b_status"] == "ambiguous"
    assert out.loc[1, "a_status"] == "resolved"
    assert out.loc[1, "a_id"] == "search"


def test_strict_gate_raises(ray_session):
    import ray.data

    from xlsx_to_graphdb_ray.stages.resolve import strict_gate

    ds = ray.data.from_pandas(pd.DataFrame({
        "kind": ["m", "m"],
        "a_status": ["resolved", "unknown"],
        "b_status": [None, None],
    }))
    with pytest.raises(RuntimeError, match="strict resolution"):
        strict_gate(ds)
