"""Exchange-primitive tests (stages/shuffle.py).

The regression here is the Ray 2.49 hash-shuffle empty-partition crash:
``groupby(bucket).map_groups`` sorts each finalized partition by the key,
and a partition that received no rows finalizes as a schema-less empty
block → ``sort_by('__bucket')`` raises ArrowInvalid. The race arms when
the first-scheduled shuffle input block is EMPTY (the one-shot schema
broadcast is swallowed, ray hash_shuffle.py:223-225) and the data has
fewer distinct keys than partitions. ``partition_map`` avoids the sort
path entirely (repartition keys=..., sort=False), so the crash cannot
occur; these tests pin the shape that used to flake (ivf partials: mostly
empty blocks, one distinct query id).
"""

import numpy as np
import pandas as pd
import pytest
import ray.data

from xlsx_to_graphdb_ray.config import tune_context
from xlsx_to_graphdb_ray.stages.shuffle import (bucketed_map_groups,
                                                grouped_agg, partition_map)


def _empty_heavy_partials(ray_session):
    """50 blocks; all but two map outputs are EMPTY frames; one key."""
    ds = ray.data.range(200, override_num_blocks=50)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if (b["id"] % 100 != 0).all():
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "v": pd.Series([], dtype="float64")})
        return pd.DataFrame({"query_id": [7] * len(b),
                             "v": [1.0] * len(b)})

    return ds.map_batches(partial, batch_format="pandas")


def test_partition_map_survives_empty_blocks_single_key(ray_session):
    tune_context()
    p = _empty_heavy_partials(ray_session)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("query_id", as_index=False).agg(n=("v", "size"))

    # repeat: the historical failure was a scheduling race
    for _ in range(5):
        out = bucketed_map_groups(p, ["query_id"], combine,
                                  n_buckets=8).to_pandas()
        assert out["n"].sum() == 8  # two non-empty blocks x 4 rows

    agg = grouped_agg(p, ["query_id"], [("n", None, "count")],
                      n_buckets=8).to_pandas()
    assert agg["n"].sum() == 8


def test_partition_map_colocates_keys(ray_session):
    """Every row of a key lands in exactly one fn call, and per-call
    frames may contain MANY keys (callers must group internally)."""
    tune_context()
    df = pd.DataFrame({"k": np.arange(1000) % 37, "v": np.arange(1000)})
    ds = ray.data.from_pandas(df, override_num_blocks=16)

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__bucket"] = (b["k"] % 11).astype("int32")
        return b

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", as_index=False).agg(s=("v", "sum"),
                                                  n=("v", "size"))

    out = partition_map(ds.map_batches(pre, batch_format="pandas"),
                        "__bucket", per_part).to_pandas()
    # one output row per key → no key was split across partitions
    assert len(out) == 37
    expect = df.groupby("k", as_index=False).agg(s=("v", "sum"),
                                                 n=("v", "size"))
    merged = out.sort_values("k").reset_index(drop=True)
    expect = expect.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        merged[["k", "s", "n"]], expect[["k", "s", "n"]],
        check_dtype=False)


def test_partition_map_empty_input(ray_session):
    tune_context()
    ds = ray.data.from_pandas(pd.DataFrame({
        "k": pd.Series([], dtype="int64"),
        "__bucket": pd.Series([], dtype="int32")}))

    called = []

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        called.append(len(g))
        return g

    out = partition_map(ds, "__bucket", fn).to_pandas()
    assert len(out) == 0
