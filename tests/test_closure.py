"""Transitive closure vs a reference-faithful DFS oracle.

The oracle reimplements the EXACT semantics of the reference's
``build_part_of_assembly_triples`` DFS (``spreadsheet_loader.py:980-1024``):
shared-visited DFS from every node; child always added even when visited.
"""

import pandas as pd
import pytest
import ray.data

from xlsx_to_graphdb_ray.stages.closure import closure_pandas, transitive_closure


def dfs_oracle(edges):
    children = {}
    for p, c in edges:
        children.setdefault(p, []).append(c)

    def desc(part, visited=None):
        if visited is None:
            visited = set()
        if part in visited:
            return set()
        visited.add(part)
        out = set()
        for ch in children.get(part, []):
            out.add(ch)
            out.update(desc(ch, visited))
        return out

    nodes = {x for e in edges for x in e}
    return {(a, d) for a in nodes for d in desc(a)}


CASES = {
    "chain": [("a", "b"), ("b", "c"), ("c", "d")],
    "diamond": [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")],
    "cycle": [("a", "b"), ("b", "a"), ("b", "c")],
    "shared_subtree": [("r", "a"), ("r", "b"), ("a", "x"), ("b", "x"),
                       ("x", "y")],
    "self_loop": [("a", "a"), ("a", "b")],
}


@pytest.mark.parametrize("name", list(CASES))
def test_closure_pandas_matches_dfs_oracle(name):
    edges = CASES[name]
    df = pd.DataFrame(edges, columns=["parent", "child"])
    got = set(map(tuple, closure_pandas(df)[["anc", "desc"]].values))
    assert got == dfs_oracle(edges)


@pytest.mark.parametrize("method", ["driver", "distributed", "doubling"])
def test_closure_dataset_all_methods(ray_session, method):
    """driver = component-partitioned parallel BFS; distributed = min-label
    components + bucketed BFS (the auto tier past DRIVER_LIMIT since the
    sf8 exercise); doubling = explicit path-doubling last resort."""
    from xlsx_to_graphdb_ray.stages import closure

    edges = CASES["shared_subtree"] + CASES["cycle"]
    ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["parent", "child"]))
    out = transitive_closure(ds, method=method)
    got = set(map(tuple, out.to_pandas()[["anc", "desc"]].values))
    assert got == dfs_oracle(edges)
    want_tier = {"driver": "driver",
                 "distributed": "distributed-components",
                 "doubling": "doubling"}[method]
    assert closure.LAST_CLOSURE_TIER == want_tier


def test_reference_golden_counts():
    """939-part analogue sanity: closure of a 3-level tree of branching b has
    sum over levels of descendants; checks the count formula on a small tree."""
    edges = []
    for i in range(3):
        edges.append(("root", f"m{i}"))
        for j in range(3):
            edges.append((f"m{i}", f"l{i}{j}"))
    got = closure_pandas(pd.DataFrame(edges, columns=["parent", "child"]))
    # root→3 mids + 9 leaves, each mid→3 leaves: 12 + 9 = 21 pairs
    assert len(got) == 21


def test_depth_topk_distributed_matches_driver(ray_session, monkeypatch):
    """Past DRIVER_LIMIT, kg_depth_topk's distributed BFS must equal the
    driver BFS (forced by shrinking the limit to 0)."""
    import pandas as pd

    from xlsx_to_graphdb_ray.pipelines import queries as q
    from xlsx_to_graphdb_ray.stages import closure

    sf = "/root/testdata/sf0.001"
    driver = q.kg_depth_topk(sf).to_pandas()
    monkeypatch.setattr(closure, "DRIVER_LIMIT", 0)
    dist = q.kg_depth_topk(sf).to_pandas()
    pd.testing.assert_frame_equal(
        driver.reset_index(drop=True), dist.reset_index(drop=True))
