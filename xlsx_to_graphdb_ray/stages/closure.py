"""Transitive closure (A6 analogue): partOfAssembly = closure of hasComponent.

The reference computes this with an in-memory DFS per node
(``build_part_of_assembly_triples``, ``spreadsheet_loader.py:980-1024``;
duplicated at ``:795-839`` — implemented exactly once here, cf. SURVEY.md
§7.4). Its semantics are plain reachability-in-≥1-step: every (ancestor,
descendant) pair connected by a directed path; cycle-safe (a node on a cycle
becomes its own descendant — the shared-``visited`` DFS yields the same set).

Reachability never crosses a weakly-connected component, so the closure of
a disjoint union is the union of per-component closures — and BOM-style
graphs are MANY small components (sf8: 2.4M edges → 36k components, max
40 nodes). Every tier exploits that:

- ``driver`` (≤ ``DRIVER_LIMIT`` distinct edges) — the edge list is
  *derived* data bounded by the entity dimension, not the input stream
  (per-block distinct runs before anything crosses to the driver), so it
  collects cheaply; components labeled with a factorized numpy union-find
  (4.6 s at 2.4M edges), then the vectorized BFS runs per component
  bucket IN PARALLEL as map tasks. The closure output is born distributed.
- ``distributed`` (auto past the limit) — same shape with no driver edge
  list: iterative min-label propagation (the ``canonicalize`` pattern)
  labels the weak components in O(diameter) bucketed join rounds, labels
  join back onto the edges, and one bucketed exchange co-locates each
  component for the same per-bucket vectorized BFS. Partitioning
  assumption (documented): one component's edge set fits a worker — the
  same assumption any per-family BOM computation makes; a component too
  big for that needs the explicit ``doubling`` method.
- ``doubling`` (explicit only) — semi-naïve path doubling: per round,
  known paths join themselves (O(log depth) rounds), already-known pairs
  removed with ``left_anti`` before the union. Correct for one giant
  component that defeats per-component partitioning, but each round
  shuffles the whole path set — at the sf8 tier exercise this ran 340 s
  where the per-component tiers run ~15 s, which is why ``auto`` no
  longer selects it.

Round-5 history: sf8 (48M turns) pushed the distinct edge set to 2.41M,
just past the old 2M limit, silently flipping ``auto`` into path doubling
— closure became 62% of the flagship wall and the 8-vs-32 scaling leg
showed a ~17% serial-ish fraction. Found by measuring, not reading.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .joins import hash_join
from .shuffle import bucketed_map_groups, grouped_distinct

_NPART = 16
# distinct-edge driver budget: 8M edges ≈ a few hundred MB of id strings —
# comfortably driver-sized on any reasonable head node, and the union-find
# on factorized int codes is seconds at this volume. Above it, auto runs
# the distributed-components tier (NOT path doubling).
DRIVER_LIMIT = 8_000_000

# observability: which tier the LAST transitive_closure call took —
# "driver" / "distributed-components" / "doubling" (same no-silent-dispatch
# discipline as dedup_docs.LAST_MINHASH_TIER; bench.py records it)
LAST_CLOSURE_TIER: str | None = None


def _distinct(ds, cols):
    return grouped_distinct(ds, cols, n_buckets=_NPART)


def closure_pandas(edges: pd.DataFrame, max_rounds: int = 64) -> pd.DataFrame:
    """Frontier BFS over (parent, child) → (anc, desc), vectorized.

    Ids are factorized to int codes first: pandas merges on int64 keys ran
    3.5× faster than on the id strings at the 2.4M-edge tier (42.7 s vs
    147.5 s measured), and every tier funnels through this kernel."""
    base = edges[["parent", "child"]].drop_duplicates()
    if base.empty:
        return pd.DataFrame({"anc": pd.Series([], dtype=object),
                             "desc": pd.Series([], dtype=object)})
    codes, uniques = pd.factorize(
        pd.concat([base["parent"], base["child"]], ignore_index=True))
    ibase = pd.DataFrame({"anc": codes[:len(base)], "desc": codes[len(base):]})
    paths = ibase
    frontier = ibase
    extend = ibase.rename(columns={"anc": "parent"})
    for _ in range(max_rounds):
        step = frontier.merge(extend, left_on="desc", right_on="parent")
        step = step[["anc", "desc_y"]].rename(columns={"desc_y": "desc"}) \
            .drop_duplicates()
        if step.empty:
            break
        new = step.merge(paths, how="left", indicator=True,
                         on=["anc", "desc"])
        new = new[new["_merge"] == "left_only"][["anc", "desc"]]
        if new.empty:
            break
        paths = pd.concat([paths, new], ignore_index=True)
        frontier = new
    uniques = np.asarray(uniques)
    out = pd.DataFrame({"anc": uniques[paths["anc"].to_numpy()],
                        "desc": uniques[paths["desc"].to_numpy()]})
    return out.sort_values(["anc", "desc"]).reset_index(drop=True)


def _component_roots(pu: np.ndarray, cu: np.ndarray, n: int) -> np.ndarray:
    """Weak-component root label per node, path-compressed union-find over
    int-coded edges (4.6 s at 2.4M edges / 1.2M nodes, measured)."""
    parent = np.arange(n)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pu, cu):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    return np.array([find(i) for i in range(n)])


def _closure_by_component(edges: pd.DataFrame, max_rounds: int):
    """Driver tier: label components (factorized union-find), hash the
    labels into buckets, run the vectorized BFS per bucket IN PARALLEL via
    map tasks — the closure output is born distributed (one block per
    bucket) instead of one giant driver block. Skew story: a hot root only
    inflates its own component's bucket, and components are bounded by
    family size, not corpus size."""
    codes, uniques = pd.factorize(
        pd.concat([edges["parent"], edges["child"]], ignore_index=True))
    pu, cu = codes[:len(edges)], codes[len(edges):]
    roots = _component_roots(pu, cu, len(uniques))
    buckets = roots[pu] % _NPART

    # partition on the driver (edges are already here) → one block per
    # bucket, no shuffle op at all; closure runs as parallel map tasks
    blocks = [g[["parent", "child"]].reset_index(drop=True)
              for _, g in edges.groupby(buckets, sort=False)]
    return ray.data.from_pandas(blocks).map_batches(
        lambda g: closure_pandas(g, max_rounds),
        batch_format="pandas", batch_size=None)


def _closure_distributed_components(base, max_rounds: int):
    """Distributed tier: min-label weak-component labeling (one label hop
    per round, O(diameter) bucketed joins — the ``canonicalize``
    distributed pattern), then ONE bucketed exchange co-locates each
    component's edges for the same per-bucket vectorized BFS. ``base`` is
    the distinct (parent, child) Dataset, already materialized."""
    from ray.data.aggregate import Max

    from .shuffle import grouped_agg

    def _as_arrow(ds):
        return ds.map_batches(lambda t: t, batch_format="pyarrow")

    undirected = _distinct(base.map_batches(
        lambda b: pd.concat([
            pd.DataFrame({"u": b["parent"], "v": b["child"]}),
            pd.DataFrame({"u": b["child"], "v": b["parent"]}),
        ], ignore_index=True).drop_duplicates(),
        batch_format="pandas"), ["u", "v"]).materialize()

    labels = _distinct(undirected.map_batches(
        lambda b: pd.DataFrame({"node": b["u"], "label": b["u"]}),
        batch_format="pandas"), ["node", "label"]).materialize()
    for _ in range(max_rounds):
        flowed = hash_join(undirected, labels, on=["u"], right_on=["node"],
                           n_buckets=_NPART).map_batches(
            lambda b: pd.DataFrame({"node": b["v"], "label": b["label"]}),
            batch_format="pandas")
        new_labels = grouped_agg(
            _as_arrow(flowed).union(_as_arrow(labels)),
            ["node"], [("label", "label", "min")], n_buckets=_NPART,
        ).materialize()
        changed = hash_join(new_labels, labels, on=["node"],
                            n_buckets=_NPART, suffix="_old").map_batches(
            lambda b: pd.DataFrame(
                {"diff": (b["label"] != b["label_old"]).astype("int64")}),
            batch_format="pandas").aggregate(Max("diff"))
        labels = new_labels
        if not changed or not changed.get("max(diff)", 0):
            break

    labeled = hash_join(base, labels, on=["parent"], right_on=["node"],
                        n_buckets=_NPART)
    # co-locate each component (bucketed by label hash), BFS per bucket; a
    # bucket is a disjoint union of whole components, which the BFS kernel
    # handles natively
    return bucketed_map_groups(
        labeled.map_batches(
            lambda b: b[["label", "parent", "child"]],
            batch_format="pandas"),
        ["label"],
        lambda g: closure_pandas(g[["parent", "child"]], max_rounds),
        n_buckets=_NPART)


def transitive_closure(edges_ds, method: str = "auto", max_rounds: int = 64):
    """Dataset of (parent, child) → Dataset of (anc, desc).

    Result contains every pair with a directed path parent →+ child.
    ``method``: "auto" (driver-components under ``DRIVER_LIMIT``, else
    distributed-components), or explicit "driver" / "distributed" /
    "doubling".
    """
    global LAST_CLOSURE_TIER
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
            LAST_CLOSURE_TIER = "driver"
            if edges.empty:
                return ray.data.from_pandas(
                    pd.DataFrame({"anc": pd.Series([], dtype=object),
                                  "desc": pd.Series([], dtype=object)}))
            return _closure_by_component(edges, max_rounds)

    base = _distinct(
        edges_ds.map_batches(
            lambda b: pd.DataFrame({"parent": b["parent"],
                                    "child": b["child"]}),
            batch_format="pandas"),
        ["parent", "child"],
    ).materialize()

    if method != "doubling":
        LAST_CLOSURE_TIER = "distributed-components"
        return _closure_distributed_components(base, max_rounds)

    # explicit path doubling: the only tier that survives one single
    # component too large for any worker; every round shuffles the whole
    # path set, so auto never picks it (340 s vs ~15 s at the sf8 tier)
    LAST_CLOSURE_TIER = "doubling"
    base = base.map_batches(
        lambda b: pd.DataFrame({"anc": b["parent"], "desc": b["child"]}),
        batch_format="pandas").materialize()
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
        paths = _as_arrow_ds(paths).union(_as_arrow_ds(new)).materialize()
        frontier = new
    return paths


def _as_arrow_ds(ds):
    return ds.map_batches(lambda t: t, batch_format="pyarrow")
