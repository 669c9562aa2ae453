"""Extraction stage: mention/relation/tool events from turn text."""

import pyarrow as pa

from xlsx_to_graphdb_ray.stages.extract import extract_events


def _turns(rows):
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "text": pa.array([r[2] for r in rows], pa.string()),
        "tool": pa.array([r[3] for r in rows], pa.string()),
    })


def test_mentions_with_ord():
    t = _turns([
        ("c1", 0, "please check [[alpha rotor 1]] and [[ beta valve 2 ]]", None),
        ("c1", 1, "no mentions here", None),
        ("c1", 2, "one [[GAMMA SENSOR 3]]", None),
    ])
    ev = extract_events(t).to_pydict()
    m = sorted((c, i, o, a) for c, i, o, k, a in zip(
        ev["conv_id"], ev["turn_idx"], ev["ord"], ev["kind"], ev["a"])
        if k == "m")
    assert m == [
        ("c1", 0, 0, "alpha rotor 1"),
        ("c1", 0, 1, " beta valve 2 "),
        ("c1", 2, 0, "GAMMA SENSOR 3"),
    ]


def test_relations_and_operand_mentions():
    t = _turns([
        ("c1", 0, "x [[a 1]] includes [[b 2]] y", None),
        ("c1", 1, "x [[a 1]] depends on [[b 2]]", None),
        ("c1", 2, "[[d 9]] documents [[a 1]]", None),
        ("c1", 3, "[[a 1]] is replaced by [[c 3]]", None),
        ("c1", 4, "[[P1]] aka [[P2]]", None),
    ])
    ev = extract_events(t)
    rel = {(ti, p): (a, b) for ti, k, a, b, p in zip(
        ev["turn_idx"].to_pylist(), ev["kind"].to_pylist(),
        ev["a"].to_pylist(), ev["b"].to_pylist(), ev["pred"].to_pylist())
        if k == "r"}
    assert rel == {
        (0, "hasComponent"): ("a 1", "b 2"),
        (1, "dependsOn"): ("a 1", "b 2"),
        (2, "describes"): ("d 9", "a 1"),
        (3, "hasAlternate"): ("a 1", "c 3"),
        (4, "sameAs"): ("P1", "P2"),
    }
    # operands are mention events too
    n_mentions = sum(1 for k in ev["kind"].to_pylist() if k == "m")
    assert n_mentions == 10


def test_tool_events():
    t = _turns([
        ("c1", 0, "result: ok", "search"),
        ("c1", 1, "plain", None),
    ])
    ev = extract_events(t)
    tools = [(ti, a) for ti, k, a in zip(
        ev["turn_idx"].to_pylist(), ev["kind"].to_pylist(),
        ev["a"].to_pylist()) if k == "t"]
    assert tools == [(0, "search")]
