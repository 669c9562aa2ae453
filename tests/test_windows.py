"""Stream-window operators — unit-handling regressions."""

import pandas as pd


def _events_df():
    ts = pd.to_datetime([
        "2024-01-01 00:05:00", "2024-01-01 00:35:00",
        "2024-01-01 01:10:00", "2024-01-01 02:59:00"])
    return pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [10, 10, 11, 11],
        "event_type": ["view", "view", "purchase", "view"],
        "value": [1.0, 2.0, 3.0, 4.0],
        "ts": ts,
    })


def test_hopping_counts_ns_and_us_timestamps_agree(ray_session):
    """A datetime64[ns] batch (from_pandas on pd.to_datetime output) must
    produce the same windows as the datetime64[us] form — the integer view
    is unit-normalized, not assumed to be microseconds (advisor finding)."""
    import ray.data

    from xlsx_to_graphdb_ray.stages.windows import hopping_counts

    df_ns = _events_df()
    assert df_ns["ts"].dtype == "datetime64[ns]"
    df_us = df_ns.assign(ts=df_ns["ts"].astype("datetime64[us]"))

    key = ["window_start", "event_type"]
    out_ns = hopping_counts(ray.data.from_pandas(df_ns)).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    out_us = hopping_counts(ray.data.from_pandas(df_us)).to_pandas() \
        .sort_values(key).reset_index(drop=True)
    out_ns["window_start"] = out_ns["window_start"].astype("datetime64[us]")
    out_us["window_start"] = out_us["window_start"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(out_ns, out_us)
    # each event lands in exactly window/slide = 2 windows
    assert int(out_ns["n"].sum()) == 2 * len(df_ns)
    # sanity: the 00:05 event's enclosing hour-long windows start at
    # 23:30 and 00:00 — i.e. real wall-clock times, not 1970-epoch
    # artifacts of a 1000x unit error
    starts = set(out_ns["window_start"].astype(str))
    assert "2024-01-01 00:00:00" in starts and \
        "2023-12-31 23:30:00" in starts


def test_quantile_sketch_within_one_bin_of_exact(ray_session):
    """value_quantiles_sketch (the 100 TB path) must land within one bin
    width of the exact kernel for every (event_type, pct), and be exact
    when a type's values are all equal (zero-width range)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from xlsx_to_graphdb_ray.stages.windows import (
        N_SKETCH_BINS,
        value_quantiles,
        value_quantiles_sketch,
    )

    ds = ray.data.read_parquet("/root/testdata/sf0.01/events.parquet")
    exact = value_quantiles(ds).to_pandas() \
        .set_index(["event_type", "pct"]).sort_index()
    sk = value_quantiles_sketch(ds).to_pandas() \
        .set_index(["event_type", "pct"]).sort_index()
    assert list(exact.index) == list(sk.index)
    rng = ds.to_pandas().groupby("event_type")["value"].agg(["min", "max"])
    width = (rng["max"] - rng["min"]) / N_SKETCH_BINS
    err = (exact["value"] - sk["value"]).abs().groupby(level=0).max()
    for et in err.index:
        assert err.loc[et] <= width.loc[et] + 1e-12, (et, err.loc[et])

    # degenerate range: all values equal → sketch returns the value exactly
    const = ray.data.from_pandas(pd.DataFrame({
        "event_type": ["x"] * 10 + ["y"] * 5,
        "value": [7.5] * 10 + [1.0] * 5}))
    out = value_quantiles_sketch(const).to_pandas() \
        .set_index(["event_type", "pct"])["value"]
    assert np.allclose(out.loc["x"], 7.5) and np.allclose(out.loc["y"], 1.0)
