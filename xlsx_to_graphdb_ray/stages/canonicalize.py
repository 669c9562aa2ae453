"""Canonicalization: union-find merge of aliased entities (sameAs edges).

The north-star's "groupby(entity_key)-aggregate shuffle with union-find merge
of aliased mentions": entities linked by resolved ``sameAs`` relations are
merged into one canonical id — the minimum id reachable in the undirected
sameAs graph (deterministic representative).

Two interchangeable implementations behind ``sameas_components``:

- ``driver``  — classic union-find with path compression over the collected
  pair list. The sameAs pair set is *derived* data, orders of magnitude
  smaller than the turn stream, and the resulting delta map must fit on the
  driver anyway to be broadcast into the triple builders — so when
  ``pairs.count()`` is under ``DRIVER_LIMIT`` this is strictly better than a
  shuffle. (Same reasoning the reference applies by holding its name index
  in one dict, ``spreadsheet_loader.py:1041-1052``.)
- ``distributed`` — iterative min-label propagation in Dataset ops: per
  round, labels flow along edges via a hash-partitioned ``Dataset.join`` and
  each node keeps the min of its own and incoming labels
  (``groupby(node).aggregate(Min)`` — Ray pre-combines per block, so hub
  nodes don't need salting: aggregate state is one value per node, not the
  row list). Rounds = component diameter. This is the path for alias graphs
  too large to collect; it exists, is tested, and ``auto`` switches to it
  past the threshold.
"""

from __future__ import annotations

import pandas as pd
from ray.data.aggregate import Max

from .joins import hash_join
from .shuffle import grouped_agg, grouped_distinct

_NPART = 16
DRIVER_LIMIT = 2_000_000  # pairs; above this, auto uses the distributed path


def _distinct(ds, cols):
    return grouped_distinct(ds, cols, n_buckets=_NPART)


def _as_arrow(ds):
    """Normalize block type so union() sides match."""
    return ds.map_batches(lambda t: t, batch_format="pyarrow")


def _union_find(pairs: pd.DataFrame) -> pd.DataFrame:
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(pairs["a_id"], pairs["b_id"]):
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by min-id so the representative is deterministic
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo

    rows = [(x, find(x)) for x in parent]
    out = pd.DataFrame(rows, columns=["entity_id", "canon_id"])
    return out[out["entity_id"] != out["canon_id"]] \
        .sort_values("entity_id").reset_index(drop=True)


def sameas_components(pairs_ds, method: str = "auto",
                      max_rounds: int = 25) -> pd.DataFrame:
    """Dataset of (a_id, b_id) sameAs pairs → pandas (entity_id, canon_id).

    Only non-identity mappings are returned (the broadcastable delta map).
    """
    if method in ("auto", "driver"):
        # single execution: pull the (derived, small) pair list and dispatch
        # on its actual size — to_pandas(limit) raises past the threshold.
        # Per-block distinct FIRST: the same sameAs assertion repeats across
        # turns, so the raw pair stream scales with input while the distinct
        # alias vocabulary is bounded by the entity dimension (measured
        # ~20× smaller at sf4, where the duplicated stream tripped the 2M
        # driver limit into the iterative path for a 107k-pair vocabulary)
        slim = pairs_ds.select_columns(["a_id", "b_id"]).map_batches(
            lambda b: b.drop_duplicates(), batch_format="pandas",
            batch_size=None)
        try:
            pairs = slim.to_pandas(limit=DRIVER_LIMIT)
            if len(pairs) == 0:
                return pd.DataFrame({"entity_id": [], "canon_id": []})
            return _union_find(pairs.drop_duplicates())
        except ValueError:
            if method == "driver":
                raise
            method = "distributed"
    if pairs_ds.count() == 0:
        return pd.DataFrame({"entity_id": [], "canon_id": []})

    def both_dirs(b: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame({"u": b["a_id"], "v": b["b_id"]})
        rev = pd.DataFrame({"u": b["b_id"], "v": b["a_id"]})
        return pd.concat([fwd, rev], ignore_index=True).drop_duplicates()

    edges = _distinct(
        pairs_ds.map_batches(both_dirs, batch_format="pandas"), ["u", "v"]
    ).materialize()
    if edges.count() == 0:
        return pd.DataFrame({"entity_id": [], "canon_id": []})

    labels = _distinct(
        edges.map_batches(
            lambda b: pd.DataFrame({"node": b["u"], "label": b["u"]}),
            batch_format="pandas"),
        ["node", "label"],
    ).materialize()

    for _ in range(max_rounds):
        flowed = hash_join(
            edges, labels, on=["u"], right_on=["node"], n_buckets=_NPART,
        ).map_batches(
            lambda b: pd.DataFrame({"node": b["v"], "label": b["label"]}),
            batch_format="pandas",
        )
        new_labels = grouped_agg(
            _as_arrow(flowed).union(_as_arrow(labels)),
            ["node"], [("label", "label", "min")], n_buckets=_NPART,
        ).materialize()
        changed = (
            hash_join(new_labels, labels, on=["node"], n_buckets=_NPART,
                      suffix="_old")
            .map_batches(
                lambda b: pd.DataFrame(
                    {"diff": (b["label"] != b["label_old"]).astype("int64")}),
                batch_format="pandas")
            .aggregate(Max("diff"))
        )
        labels = new_labels
        if not changed or not changed.get("max(diff)", 0):
            break

    out = labels.to_pandas().rename(
        columns={"node": "entity_id", "label": "canon_id"})
    return out[out["entity_id"] != out["canon_id"]] \
        .sort_values("entity_id").reset_index(drop=True)


def canonical_mapper(delta_map: pd.DataFrame):
    """Return a vectorized (Series -> Series) canonical-id mapper."""
    m = dict(zip(delta_map["entity_id"], delta_map["canon_id"]))

    def apply(s: pd.Series) -> pd.Series:
        if not m:
            return s
        mapped = s.map(m)
        return mapped.where(mapped.notna(), s)

    return apply
