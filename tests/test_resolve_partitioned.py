"""Broadcast resolve ≡ partitioned-join resolve (scale path equivalence)."""

import pandas as pd
import ray.data

from xlsx_to_graphdb_ray import synth
from xlsx_to_graphdb_ray.stages.dictionary import build_lookup_dicts
from xlsx_to_graphdb_ray.stages.extract import extract_events
from xlsx_to_graphdb_ray.stages.resolve import (
    resolve_events,
    resolve_events_partitioned,
)

SF = "/root/testdata/sf0.001"


def test_partitioned_resolve_matches_broadcast(ray_session):
    paths = synth.ensure_synth(SF)
    turns = ray.data.read_parquet(
        paths["turns"], columns=["conv_id", "turn_idx", "text", "tool"]
    ).limit(2000)
    events = turns.map_batches(extract_events, batch_format="pyarrow") \
        .materialize()

    broadcast = resolve_events(events, build_lookup_dicts(paths["entities"]))
    partitioned = resolve_events_partitioned(
        events, ray.data.read_parquet(paths["entities"]))

    cols = ["conv_id", "turn_idx", "ord", "kind", "a", "a_id", "a_status",
            "a_ncand", "b", "b_id", "b_status", "b_ncand"]

    def norm(ds):
        df = ds.to_pandas()[cols].copy()
        for c in ("a_id", "a_status", "b", "b_id", "b_status"):
            df[c] = df[c].where(pd.notna(df[c]), None).astype(str)
        for c in ("turn_idx", "ord", "a_ncand", "b_ncand"):
            df[c] = df[c].astype("int64")
        return df.sort_values(cols, kind="mergesort").reset_index(drop=True)

    a, b = norm(broadcast), norm(partitioned)
    assert len(a) == len(b) > 0
    pd.testing.assert_frame_equal(a, b)
