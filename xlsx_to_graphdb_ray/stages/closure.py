"""Transitive closure (A6 analogue): partOfAssembly = closure of hasComponent.

The reference computes this with an in-memory DFS per node
(``build_part_of_assembly_triples``, ``spreadsheet_loader.py:980-1024``;
duplicated at ``:795-839`` — implemented exactly once here, cf. SURVEY.md
§7.4). Its semantics are plain reachability-in-≥1-step: every (ancestor,
descendant) pair connected by a directed path; cycle-safe (a node on a cycle
becomes its own descendant — the shared-``visited`` DFS yields the same set).

Two implementations behind ``transitive_closure``:

- ``driver`` — vectorized pandas frontier-BFS over the collected edge list.
  The edge set is *derived* data (≪ the turn stream; the reference held it
  in one dict too), so below ``DRIVER_LIMIT`` edges this avoids per-round
  shuffle latency entirely; every round is a C-speed ``merge`` +
  anti-``merge``.
- ``distributed`` — semi-naïve iteration with **path doubling**: per round,
  known paths are joined with themselves (hash-partitioned ``Dataset.join``)
  so path length doubles — O(log depth) rounds instead of O(depth) — and
  already-known pairs are removed with a ``left_anti`` join before the
  union. Per-round ``materialize()`` pins the (small, derived) path set so
  rounds don't re-execute lineage. This is the path for graphs whose closure
  cannot sit on the driver; ``auto`` switches to it past the threshold.
"""

from __future__ import annotations

import pandas as pd
import pandas.util
import ray.data

from .joins import hash_join
from .shuffle import grouped_distinct

_NPART = 16
DRIVER_LIMIT = 2_000_000  # edges; above this, auto uses the distributed path


def _distinct(ds, cols):
    return grouped_distinct(ds, cols, n_buckets=_NPART)


def closure_pandas(edges: pd.DataFrame, max_rounds: int = 64) -> pd.DataFrame:
    """Frontier BFS over (parent, child) → (anc, desc), vectorized."""
    base = edges[["parent", "child"]].drop_duplicates()
    paths = base.rename(columns={"parent": "anc", "child": "desc"})
    frontier = paths
    for _ in range(max_rounds):
        step = frontier.merge(
            base, left_on="desc", right_on="parent")[["anc", "child"]]
        step = step.rename(columns={"child": "desc"}).drop_duplicates()
        if step.empty:
            break
        new = step.merge(paths, how="left", indicator=True,
                         on=["anc", "desc"])
        new = new[new["_merge"] == "left_only"][["anc", "desc"]]
        if new.empty:
            break
        paths = pd.concat([paths, new], ignore_index=True)
        frontier = new
    return paths.sort_values(["anc", "desc"]).reset_index(drop=True)


def _closure_by_component(edges: pd.DataFrame, max_rounds: int) -> "ray.data.Dataset":
    """Component-partitioned closure: reachability never crosses a weakly-
    connected component, so the closure of a disjoint union is the union of
    per-component closures. Label components with driver union-find (the
    edge list already fits on the driver here), hash components into
    buckets, and run the vectorized BFS per bucket IN PARALLEL via
    ``groupby(bucket).map_groups`` — the closure output is born distributed
    (one block per bucket) instead of one giant driver block. This is also
    the skew story: a hot root only inflates its own component's bucket."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for u, v in zip(edges["parent"], edges["child"]):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[rv] = ru

    comp = edges["parent"].map(lambda x: find(x))
    buckets = (pandas.util.hash_pandas_object(comp.astype(str), index=False)
               % _NPART).astype("int32")

    # partition on the driver (edges are already here) → one block per
    # bucket, no shuffle op at all; closure runs as parallel map tasks
    blocks = [g[["parent", "child"]].reset_index(drop=True)
              for _, g in edges.groupby(buckets, sort=False)]
    return ray.data.from_pandas(blocks).map_batches(
        lambda g: closure_pandas(g, max_rounds),
        batch_format="pandas", batch_size=None)


def transitive_closure(edges_ds, method: str = "auto", max_rounds: int = 64):
    """Dataset of (parent, child) → Dataset of (anc, desc) (materialized).

    Result contains every pair with a directed path parent →+ child.
    """
    if method in ("auto", "driver"):
        # single execution: pull the (derived, small) edge list and dispatch
        # on its actual size — to_pandas(limit) raises past the threshold.
        # Per-block distinct FIRST: the same hasComponent edge repeats
        # across turns, so the raw edge stream scales with input while the
        # distinct edge set is bounded by the entity dimension — dedup in
        # parallel before anything crosses to the driver
        slim = edges_ds.select_columns(["parent", "child"]).map_batches(
            lambda b: b.drop_duplicates(), batch_format="pandas",
            batch_size=None)
        try:
            edges = slim.to_pandas(limit=DRIVER_LIMIT)
            edges = edges.drop_duplicates()
        except ValueError:
            if method == "driver":
                raise
            edges = None
        if edges is not None:
            if edges.empty:
                return ray.data.from_pandas(
                    pd.DataFrame({"anc": pd.Series([], dtype=object),
                                  "desc": pd.Series([], dtype=object)}))
            return _closure_by_component(edges, max_rounds)

    base = _distinct(
        edges_ds.map_batches(
            lambda b: pd.DataFrame({"anc": b["parent"], "desc": b["child"]}),
            batch_format="pandas"),
        ["anc", "desc"],
    ).materialize()

    paths = base
    frontier = base  # paths discovered last round (length exactly 2^k..)
    for _ in range(max_rounds):
        if frontier.count() == 0:
            break
        # double: any known path extended by any known path
        step = hash_join(
            paths, paths, on=["desc"], right_on=["anc"], n_buckets=_NPART,
            suffix="_r",
        ).map_batches(
            lambda b: pd.DataFrame({"anc": b["anc"], "desc": b["desc_r"]}),
            batch_format="pandas",
        )
        step = _distinct(step, ["anc", "desc"])
        new = hash_join(step, paths, on=["anc", "desc"], how="left_anti",
                        n_buckets=_NPART).materialize()
        if new.count() == 0:
            break
        paths = _as_arrow(paths).union(_as_arrow(new)).materialize()
        frontier = new
    return paths


def _as_arrow(ds):
    return ds.map_batches(lambda t: t, batch_format="pyarrow")
