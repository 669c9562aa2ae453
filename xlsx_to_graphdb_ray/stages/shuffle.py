"""Bucketed grouped aggregation — the engine's workhorse shuffle primitive.

A bare ``ds.groupby(wide_string_keys).aggregate(...)`` hash-shuffles every
row on the raw key columns; Ray's shuffle operators are expensive for
high-cardinality string keys. This module implements the classic two-phase
plan instead (partial/combiner before the exchange — SURVEY.md §4 and the
Ray guide's "Aggregation at scale"), with the per-block work done by
**Arrow's C++ hash aggregation** (``pa.Table.group_by``), not Python:

1. **pre-combine** inside ``map_batches``: per-block ``group_by`` collapses
   each key to ONE partial row per block (hot keys cost O(blocks), not
   O(occurrences) — this is the skew absorber),
2. then either
   - ``small_result=True`` (key cardinality fits one worker — entity
     dimensions, predicate counts, status counts): coalesce the partials
     with ``repartition(1)`` — **no all-to-all exchange at all** — and
     final-combine in one C++ group_by; or
   - big results (exact dedup): attach ``bucket = stable_hash(keys) % B``
     (int32) to the partials and exchange on the *narrow int column* via
     ``groupby("bucket")``, final-combining per bucket.

All aggregate fns are algebraic (min/max/sum/count → sum), so partials
merge exactly. ``B`` bounds per-task memory: one bucket's distinct keys
must fit in a worker heap.
"""

from __future__ import annotations

import numpy as np
import pandas.util
import pyarrow as pa

DEFAULT_BUCKETS = 64

# fn → (pre-combine arrow agg, final-combine arrow agg)
_ALGEBRAIC = {"min": ("min", "min"), "max": ("max", "max"),
              "sum": ("sum", "sum"), "count": ("count_all", "sum")}


def partition_map(ds, bucket_col: str, fn, batch_format: str = "pandas"):
    """Key-colocated whole-partition transform — the exchange primitive
    behind every bucketed stage (replaces ``groupby(bucket).map_groups``).

    ``repartition(keys=[bucket_col], sort=False)`` hash-partitions on the
    narrow int bucket column, then ``map_batches(batch_size=None)`` hands
    ``fn`` one WHOLE partition per call. ``fn`` may therefore see MANY
    bucket values in one call and must do its own per-key grouping — every
    caller in this repo already does (their per-key work is vectorized
    pandas/Arrow inside the bucket).

    Why not ``groupby().map_groups``:
    - it sorts each partition by the key before slicing groups — pure
      overhead here, since the callers re-group internally anyway;
    - Ray 2.49's sort-on-finalize path crashes on partitions that received
      no rows (``hash_shuffle.py:162`` ``sort_by`` on a schema-less empty
      block — the one-shot schema broadcast is swallowed when the
      first-scheduled shuffle input block is empty,
      ``hash_shuffle.py:223-225``). The no-sort repartition path never
      sorts, and empty partitions never reach ``fn``.
    """
    from ..config import tune_context, tune_context_obj
    tune_context()  # keys= repartition requires the HASH_SHUFFLE strategy
    # a Dataset SNAPSHOTS its DataContext at creation — a dataset built by a
    # caller before tune_context() ran (tests, from_pandas users) would plan
    # this repartition against the stale sort-shuffle copy; re-tune it
    tune_context_obj(ds.context)
    n_parts = ds.context.default_hash_shuffle_parallelism or 8

    def run(g):
        if not len(g):
            # schema-less empty partition block (never observed to reach
            # here — Ray drops them before the map — but fn's column
            # accesses must not be the thing that breaks if one does)
            return g
        return fn(g)

    return ds.repartition(num_blocks=n_parts, keys=[bucket_col],
                          sort=False) \
        .map_batches(run, batch_size=None, batch_format=batch_format)


def _group(table: pa.Table, keys: list[str],
           aggs: list[tuple[str, str | None, str]], phase: int) -> pa.Table:
    """One C++ hash-aggregation pass; renames agg outputs to ``out`` names."""
    specs, renames = [], {}
    for out, src, fn in aggs:
        arrow_fn = _ALGEBRAIC[fn][phase]
        if phase == 0 and fn == "count":
            specs.append(([], "count_all"))
            renames["count_all"] = out
        else:
            col = src if phase == 0 else out
            specs.append((col, arrow_fn))
            renames[f"{col}_{arrow_fn}"] = out
    g = table.group_by(keys, use_threads=False).aggregate(specs)
    return g.rename_columns([renames.get(c, c) for c in g.column_names])


def _bucket_col(table: pa.Table, keys: list[str], n: int) -> pa.Array:
    h = None
    for k in keys:
        s = table[k].to_pandas().astype(str)
        hk = pandas.util.hash_pandas_object(s, index=False).to_numpy()
        h = hk if h is None else (h * np.uint64(1000003)) ^ hk
    return pa.array((h % n).astype("int32"))


def grouped_agg(ds, keys: list[str], aggs: list[tuple[str, str | None, str]],
                n_buckets: int = DEFAULT_BUCKETS, small_result: bool = False):
    """Grouped aggregation with partial pre-combine.

    ``aggs``: list of ``(out_col, src_col, fn)``; ``fn`` ∈ min/max/sum/count
    (src_col ignored for count). Returns a Dataset with ``keys + out_cols``.
    """
    for out, _, fn in aggs:
        if fn not in _ALGEBRAIC:
            raise ValueError(f"non-algebraic aggregate: {fn}")

    def pre(batch: pa.Table) -> pa.Table:
        part = _group(batch, keys, aggs, 0)
        if not small_result:
            part = part.append_column("__bucket",
                                      _bucket_col(part, keys, n_buckets))
        return part

    def final(batch: pa.Table) -> pa.Table:
        if "__bucket" in batch.column_names:
            batch = batch.drop_columns(["__bucket"])
        return _group(batch, keys, aggs, 1)

    partials = ds.map_batches(pre, batch_format="pyarrow")
    if small_result:
        return partials.repartition(1).map_batches(
            final, batch_format="pyarrow")
    return partition_map(partials, "__bucket", final,
                         batch_format="pyarrow")


def bucketed_map_groups(ds, keys: list[str], fn,
                        n_buckets: int = DEFAULT_BUCKETS):
    """Group-wise pandas transform without one-Python-call-per-group cost:
    co-locate rows by ``stable_hash(keys) % n_buckets`` and hand ``fn``
    whole co-located partitions — ``fn`` does its own vectorized per-key
    work (the anaphora-stage pattern, generalized)."""
    import pandas as pd

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        h = None
        for k in keys:
            hk = pandas.util.hash_pandas_object(b[k].astype(str), index=False)
            h = hk if h is None else (h * np.uint64(1000003)) ^ hk
        b["__bucket"] = (h % n_buckets).astype("int32")
        return b

    return partition_map(ds.map_batches(pre, batch_format="pandas"),
                         "__bucket",
                         lambda g: fn(g.drop(columns="__bucket")))


def grouped_distinct(ds, keys: list[str], n_buckets: int = DEFAULT_BUCKETS,
                     small_result: bool = False):
    """Distinct key combinations (exact dedup, D1/D3 analogue)."""

    def pre(batch: pa.Table) -> pa.Table:
        part = batch.select(keys).group_by(
            keys, use_threads=False).aggregate([])
        if not small_result:
            part = part.append_column("__bucket",
                                      _bucket_col(part, keys, n_buckets))
        return part

    def final(batch: pa.Table) -> pa.Table:
        if "__bucket" in batch.column_names:
            batch = batch.drop_columns(["__bucket"])
        return batch.group_by(keys, use_threads=False).aggregate([])

    partials = ds.map_batches(pre, batch_format="pyarrow")
    if small_result:
        return partials.repartition(1).map_batches(
            final, batch_format="pyarrow")
    return partition_map(partials, "__bucket", final,
                         batch_format="pyarrow")
