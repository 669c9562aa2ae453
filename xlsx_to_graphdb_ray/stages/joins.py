"""Partitioned hash join as a portable Dataset primitive.

The J-family of the operator inventory (SURVEY.md §2.5) needs inner /
left / semi / anti joins between *derived* datasets. Ray 2.49 ships an
experimental ``Dataset.join``, but it trips on empty hash partitions with
tiny inputs; this module implements the documented portable pattern instead:

    add ``bucket = stable_hash(key) % B`` to both sides
    → tag the side → union → ``groupby(bucket)``
    → pandas ``merge`` per bucket inside ``map_groups``

Properties: one hash shuffle on the key columns; per-bucket work is a
vectorized C-speed ``pd.merge``; bucket count ``B`` bounds per-task memory
(both sides of one bucket must fit in a worker heap — pick B so that
|input| / B ≲ block size). Hot keys concentrate in one bucket only if a
single *key* is hot; for aggregate-style consumers prefer pre-combined
aggregates instead (see stages/triples.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pandas.util

_SIDE = "__side"
_BUCKET = "__bucket"


def group_pairs(g: pd.DataFrame, key: str, id_col: str,
                cap: int) -> pd.DataFrame:
    """All intra-group id pairs (``id_lo < id_hi``) for every ``key``
    group, fully vectorized: groups are bucketed by (capped) size and each
    distinct size expands through ONE shared ``np.triu_indices`` template
    over a gathered (n_groups, size) id matrix — no per-pair Python loop
    (the ``simhash_pairs`` emission pattern, shared across the blocking
    self-joins).

    Groups larger than ``cap`` are truncated to their first ``cap``
    ascending ids before pair emission (blocking-join fan-out guard, cf.
    reference ``ingest_changes.py:144`` ``matched[:5]``)."""
    g = g.sort_values([key, id_col], kind="mergesort")
    keys = g[key].to_numpy()
    ids = g[id_col].to_numpy()
    key_parts, lo_parts, hi_parts = [], [], []
    if len(g):
        change = np.concatenate(([True], keys[1:] != keys[:-1]))
        starts = np.flatnonzero(change)
        sizes = np.diff(np.append(starts, len(keys)))
        csizes = np.minimum(sizes, cap)
        for s in np.unique(csizes):
            if s < 2:
                continue
            sel = np.flatnonzero(csizes == s)
            mat = ids[starts[sel][:, None] + np.arange(s)[None, :]]
            iu, ju = np.triu_indices(s, k=1)
            key_parts.append(np.repeat(keys[starts[sel]], len(iu)))
            lo_parts.append(mat[:, iu].ravel())
            hi_parts.append(mat[:, ju].ravel())
    if not lo_parts:
        return pd.DataFrame({key: pd.Series([], dtype=g[key].dtype),
                             "id_lo": pd.Series([], dtype=g[id_col].dtype),
                             "id_hi": pd.Series([], dtype=g[id_col].dtype)})
    return pd.DataFrame({key: np.concatenate(key_parts),
                         "id_lo": np.concatenate(lo_parts),
                         "id_hi": np.concatenate(hi_parts)})


def _with_bucket(df: pd.DataFrame, keys: list[str], n: int) -> pd.Series:
    h = None
    for k in keys:
        hk = pandas.util.hash_pandas_object(df[k].astype(str), index=False)
        h = hk if h is None else (h * 1000003) ^ hk
    return (h % n).astype("int32")


def hash_join(left_ds, right_ds, on: list[str], *, right_on: list[str] | None = None,
              how: str = "inner", n_buckets: int = 32, suffix: str = "_r"):
    """Join two Datasets on key columns; returns a Dataset of pandas blocks.

    ``how`` ∈ {"inner", "left", "left_semi", "left_anti"}.
    """
    right_on = right_on or on
    lcols = None

    def tag(side: str, keys: list[str]):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b[_BUCKET] = _with_bucket(b, keys, n_buckets)
            b[_SIDE] = side
            return b
        return f

    l_tagged = left_ds.map_batches(tag("l", on), batch_format="pandas")
    r_tagged = right_ds.map_batches(tag("r", right_on), batch_format="pandas")

    # align schemas for union: outer-concat inside per-bucket groups instead —
    # union requires identical columns, so pad each side with the other's
    l_schema = [f for f in left_ds.schema().names]
    r_schema = [f for f in right_ds.schema().names]
    all_cols = list(dict.fromkeys(l_schema + [c + (suffix if c in l_schema else "")
                                              for c in r_schema]))

    def pad_l(b: pd.DataFrame) -> pd.DataFrame:
        for c in all_cols:
            if c not in b.columns:
                b[c] = None
        return b[all_cols + [_BUCKET, _SIDE]]

    def pad_r(b: pd.DataFrame) -> pd.DataFrame:
        ren = {c: (c + suffix) for c in r_schema if c in l_schema}
        b = b.rename(columns=ren)
        for c in all_cols:
            if c not in b.columns:
                b[c] = None
        return b[all_cols + [_BUCKET, _SIDE]]

    l_tagged = l_tagged.map_batches(pad_l, batch_format="pandas")
    r_tagged = r_tagged.map_batches(pad_r, batch_format="pandas")
    both = l_tagged.union(r_tagged)

    r_on_renamed = [c + suffix if c in l_schema else c for c in right_on]
    r_cols_renamed = [c + suffix if c in l_schema else c for c in r_schema]

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g[_SIDE] == "l"][l_schema]
        rg = g[g[_SIDE] == "r"][r_cols_renamed]
        if how == "left_semi":
            keys = rg[r_on_renamed].drop_duplicates()
            keys.columns = on
            out = lg.merge(keys, on=on, how="inner")
        elif how == "left_anti":
            keys = rg[r_on_renamed].drop_duplicates()
            keys.columns = on
            m = lg.merge(keys, on=on, how="left", indicator=True)
            out = m[m["_merge"] == "left_only"][l_schema]
        else:
            pd_how = {"inner": "inner", "left": "left"}[how]
            out = lg.merge(rg, left_on=on, right_on=r_on_renamed, how=pd_how)
        return out.reset_index(drop=True)

    from .shuffle import partition_map
    return partition_map(both, _BUCKET, join_bucket)
