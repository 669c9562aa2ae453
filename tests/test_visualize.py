"""Bounded-BFS subgraph + HTML render — ref scripts/visualize_graph.py:104-156."""

import re

import pandas as pd
import pytest
import ray

from xlsx_to_graphdb_ray.sinks.visualize import (bounded_subgraph,
                                                 render_html, visualize_kg)

EDGES = pd.DataFrame({
    "parent": ["R", "R", "R", "A", "A", "B", "C", "D", "X"],
    "child":  ["A", "B", "C", "D", "E", "D", "F", "G", "Y"],
})


@pytest.fixture()
def edges_ds(ray_session):
    return ray.data.from_pandas(EDGES, override_num_blocks=3)


def test_bfs_semantics_depth_and_visited(edges_ds):
    """Visited-once at shallowest depth; unreachable nodes excluded."""
    nodes, edges = bounded_subgraph(edges_ds, "R", max_depth=4,
                                    max_children=None)
    depth = dict(zip(nodes["id"], nodes["depth"]))
    assert depth == {"R": 0, "A": 1, "B": 1, "C": 1,
                     "D": 2, "E": 2, "F": 2, "G": 3}
    # X→Y unreachable from R; D reached twice but visited once (depth 2)
    assert "X" not in depth and "Y" not in depth
    assert ("A", "D") in set(map(tuple, edges.values))
    assert ("B", "D") in set(map(tuple, edges.values))


def test_depth_cutoff_and_children_cap(edges_ds):
    nodes, _ = bounded_subgraph(edges_ds, "R", max_depth=1)
    assert set(nodes["id"]) == {"R", "A", "B", "C"}
    # cap=2 keeps the 2 smallest child ids per parent (deterministic order)
    nodes, edges = bounded_subgraph(edges_ds, "R", max_depth=4,
                                    max_children=2)
    kids_of_r = sorted(edges[edges["parent"] == "R"]["child"])
    assert kids_of_r == ["A", "B"]
    assert "C" not in set(nodes["id"]) and "F" not in set(nodes["id"])


def test_render_html_is_self_contained_and_deterministic():
    nodes = pd.DataFrame({"id": ["R", "A"], "depth": [0, 1]})
    edges = pd.DataFrame({"parent": ["R"], "child": ["A"]})
    doc = render_html(nodes, edges, {"R": "Root <Part>"})
    assert doc == render_html(nodes, edges, {"R": "Root <Part>"})
    assert "<svg" in doc and "Root &lt;Part&gt;" in doc
    assert "http-equiv" not in doc and "src=" not in doc  # no external assets
    assert len(re.findall(r"<rect", doc)) == 2
    assert len(re.findall(r"<line", doc)) == 1


def test_visualize_kg_end_to_end(ray_session, tmp_path):
    """Root with real components at sf0.001 → labeled HTML artifact."""
    from xlsx_to_graphdb_ray.pipelines.queries import \
        _canonical_component_edges

    sf = "/root/testdata/sf0.001"
    some = _canonical_component_edges(sf).take(50)
    root = sorted(r["parent"] for r in some)[0]
    out = str(tmp_path / "g.html")
    stats = visualize_kg(sf, root, out, max_depth=3, max_children=5)
    assert stats["nodes"] > 1 and stats["edges"] >= stats["nodes"] - 1
    doc = open(out, encoding="utf-8").read()
    assert "<svg" in doc and root in doc
