"""Stream-shaped operators over the ordered ``events`` log.

Ray Data has no event-time windows (SURVEY.md §2.10 — the reference has no
streaming concepts either); these re-express the standard stream patterns as
partition-by-key + sort-within-partition batch transforms, the same design
the order-sensitive anaphora stage uses:

- tumbling window  → derive ``window_start`` per row (pure kernel) then a
  two-phase grouped aggregate — no per-key ordering needed at all.
- sessionization   → ``groupby(user_bucket)`` + vectorized pandas gap scan
  (30-min inactivity closes a session).
- as-of / next-event join (J8 analogue, ref
  ``windchill_odata_temporal_import.py:228-247`` EVOLVES_TO: first successor
  only) → per-bucket ``pd.merge_asof`` forward join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pandas.util
import pyarrow as pa
import pyarrow.compute as pc

from .shuffle import grouped_agg, bucketed_map_groups, partition_map  # noqa: F401

N_BUCKETS = 64
SESSION_GAP_MIN = 30


def tumbling_counts(events_ds, unit: str = "hour"):
    """(window_start, event_type) → n, sum_value (rounded)."""

    def win(b: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": pc.floor_temporal(b["ts"], unit=unit),
            "event_type": b["event_type"],
            "value": b["value"],
        })

    agg = grouped_agg(events_ds.map_batches(win, batch_format="pyarrow"),
                      ["window_start", "event_type"],
                      [("n", None, "count"), ("sum_value", "value", "sum")],
                      n_buckets=16)
    return agg.map_batches(
        lambda b: b.assign(sum_value=b["sum_value"].round(2)),
        batch_format="pandas")


def hopping_counts(events_ds, window_min: int = 60, slide_min: int = 30):
    """Hopping (sliding) windows: length ``window_min``, stride
    ``slide_min`` — each event lands in window_min/slide_min overlapping
    windows. Returns (window_start, event_type, n, sum_value).

    Vectorized fan-out: per batch, rows are ``np.repeat``-ed W/S times
    with window starts ``floor(ts/S)*S - i*S`` (all of which contain the
    event when S divides W), then the same two-phase pre-combined
    aggregation as ``tumbling_counts`` — fan-out happens BEFORE the
    pre-combine, so the exchange still ships one partial row per
    (window, type, block), not per event."""
    if window_min % slide_min:
        raise ValueError("slide must divide window")
    w_us = window_min * 60_000_000
    s_us = slide_min * 60_000_000
    k = window_min // slide_min

    def fan_out(b: pd.DataFrame) -> pd.DataFrame:
        # unit-aware: a datetime64[ns] batch (e.g. from_pandas on
        # pd.to_datetime output) must not be read as microseconds — force
        # the us unit before the integer view (advisor finding, round 3)
        e = b["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        base = (e // s_us) * s_us
        starts = np.repeat(base, k) - np.tile(
            np.arange(k, dtype=np.int64) * s_us, len(b))
        return pd.DataFrame({
            "window_start": pd.to_datetime(starts, unit="us"),
            "event_type": np.repeat(b["event_type"].to_numpy(), k),
            "value": np.repeat(b["value"].to_numpy(), k),
        })

    agg = grouped_agg(events_ds.map_batches(fan_out, batch_format="pandas"),
                      ["window_start", "event_type"],
                      [("n", None, "count"), ("sum_value", "value", "sum")],
                      n_buckets=16)
    return agg.map_batches(
        lambda b: b.assign(sum_value=b["sum_value"].round(2)),
        batch_format="pandas")


QUANTILE_PCTS = (50, 90, 99)


def value_quantiles(events_ds, pcts: tuple[int, ...] = QUANTILE_PCTS):
    """(event_type, pct, value) — EXACT per-type quantiles: pct p maps to
    the element at 1-based rank ``ceil(n·p/100)`` of the sorted values,
    computed with pure integer rank arithmetic ``(n·p + 99) // 100`` so
    numpy and the SQL oracle select the identical element (no float
    rounding at rank boundaries).

    Scale note: exact quantiles need each group's values co-located, and
    event_type cardinality is tiny — so this is a deliberate hot-key-ok
    design (one bucket holds one type's value vector; values are 8-byte
    floats, 100 TB of events ≈ a few GB of values per type after the
    column prune). Past that, swap the per-bucket kernel for a mergeable
    sketch (KLL/t-digest) behind the same (type, pct, value) contract.
    """

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for et, grp in g.groupby("event_type", sort=False):
            v = np.sort(grp["value"].to_numpy())
            n = len(v)
            for p in pcts:
                out.append((et, p, v[(n * p + 99) // 100 - 1]))
        return pd.DataFrame(out, columns=["event_type", "pct", "value"])

    pruned = events_ds.map_batches(
        lambda b: b[["event_type", "value"]], batch_format="pandas")
    return bucketed_map_groups(pruned, ["event_type"], per_bucket,
                               n_buckets=8)


N_SKETCH_BINS = 4096


def value_quantiles_sketch(events_ds, pcts: tuple[int, ...] = QUANTILE_PCTS,
                           n_bins: int = N_SKETCH_BINS):
    """(event_type, pct, value) — the 100 TB quantile path: a mergeable
    equi-width histogram sketch behind the same contract as the exact
    ``value_quantiles``. Two streaming passes, no per-type value
    co-location:

    1. tiny ``(event_type, min, max)`` aggregate (pre-combined per block);
    2. per-block partial histograms → grouped sum — the only exchange is
       O(types × n_bins) count rows, independent of input size.

    The estimate is the UPPER edge of the bin holding 1-based rank
    ``ceil(n·p/100)`` (the exact path's rank), so the absolute error is
    bounded by one bin width ``(max-min)/n_bins`` — asserted against the
    exact kernel by the accuracy test. Deterministic: identical input →
    identical histogram → identical estimates, any partitioning."""
    import ray

    pruned = events_ds.map_batches(
        lambda b: b[["event_type", "value"]], batch_format="pandas")

    def mm_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("event_type", as_index=False)["value"]             .agg(["min", "max"])
        return g.reset_index() if "event_type" not in g.columns else g

    ranges = grouped_agg(pruned.map_batches(mm_partial, batch_format="pandas"),
                         ["event_type"],
                         [("lo", "min", "min"), ("hi", "max", "max")],
                         small_result=True).to_pandas(limit=1_000_000)
    ranges = ranges.set_index("event_type")
    rng_ref = ray.put(ranges)

    def hist_partial(b: pd.DataFrame, *, rng_ref) -> pd.DataFrame:
        rng = ray.get(rng_ref) if isinstance(rng_ref, ray.ObjectRef) \
            else rng_ref
        lo = rng["lo"].reindex(b["event_type"]).to_numpy()
        hi = rng["hi"].reindex(b["event_type"]).to_numpy()
        width = np.maximum(hi - lo, 1e-300)
        v = b["value"].to_numpy()
        bins = np.clip(((v - lo) / width * n_bins).astype(np.int64),
                       0, n_bins - 1)
        part = pd.DataFrame({"event_type": b["event_type"].values,
                             "bin": bins})
        return part.groupby(["event_type", "bin"], as_index=False) \
            .size().rename(columns={"size": "n"})

    hist = grouped_agg(
        pruned.map_batches(hist_partial, fn_kwargs={"rng_ref": rng_ref},
                           batch_format="pandas"),
        ["event_type", "bin"], [("n", "n", "sum")],
        small_result=True).to_pandas(limit=2_000_000)

    out = []
    for et, g in hist.groupby("event_type", sort=False):
        g = g.sort_values("bin")
        counts = g["n"].to_numpy()
        edges = g["bin"].to_numpy()
        cdf = np.cumsum(counts)
        n = int(cdf[-1])
        lo = float(ranges.loc[et, "lo"])
        width = (float(ranges.loc[et, "hi"]) - lo) / n_bins
        for p in pcts:
            rank = (n * p + 99) // 100
            i = int(np.searchsorted(cdf, rank))
            est = lo if width <= 0 else lo + (edges[i] + 1) * width
            out.append((et, p, est))
    import ray.data
    return ray.data.from_pandas(pd.DataFrame(
        out, columns=["event_type", "pct", "value"]))


def _bucket(df: pd.DataFrame, key: str, n: int) -> pd.DataFrame:
    df = df.copy()
    df["__bucket"] = (pandas.util.hash_pandas_object(
        df[key].astype(str), index=False) % n).astype("int32")
    return df


def sessionize(events_ds, gap_minutes: int = SESSION_GAP_MIN):
    """Sessions per user: a new session starts when the gap since the
    previous event exceeds ``gap_minutes``. Returns one row per session:
    (user_id, session_idx, n_events, start_ts, end_ts)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        by_user = g.groupby("user_id", sort=False)
        gap = by_user["ts"].diff()
        new_session = gap.isna() | (gap > pd.Timedelta(minutes=gap_minutes))
        g["session_idx"] = new_session.groupby(g["user_id"]).cumsum() \
            .astype("int64") - 1
        out = g.groupby(["user_id", "session_idx"], as_index=False).agg(
            n_events=("event_id", "size"),
            start_ts=("ts", "min"),
            end_ts=("ts", "max"))
        return out

    bucketed = events_ds.map_batches(
        lambda b: _bucket(b, "user_id", N_BUCKETS), batch_format="pandas")
    return partition_map(bucketed, "__bucket", per_bucket)


def type_transitions(events_ds):
    """J7-style grouped consecutive pairing: per user in (ts, event_id)
    order, count (prev_type → next_type) transitions: (prev_type,
    next_type, n)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = g.groupby("user_id", sort=False)["event_type"].shift(1)
        keep = prev.notna()
        out = pd.DataFrame({"prev_type": prev[keep],
                            "next_type": g["event_type"][keep]})
        return out.groupby(["prev_type", "next_type"], as_index=False) \
            .size().rename(columns={"size": "n"})

    parts = bucketed_map_groups_events(events_ds, per_bucket)
    return grouped_agg(parts, ["prev_type", "next_type"],
                       [("n", "n", "sum")], small_result=True)


def props_value_sum(events_ds):
    """JSON scalar extraction (§2.9): parse ``props`` (JSON object with an
    integer ``k``) and sum per event_type: (event_type, sum_k). Extraction
    uses a vectorized regex over the fixed-shape payload; the oracle uses
    DuckDB's json_extract — identical on valid JSON."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def vals(b: pa.Table) -> pa.Table:
        ext = pc.extract_regex(pc.fill_null(b["props"], "{}"),
                               r'"k":\s*(?P<k>-?[0-9]+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        return pa.table({"event_type": b["event_type"],
                         "k": pc.fill_null(k, 0)})

    from .shuffle import grouped_agg as _ga
    return _ga(events_ds.map_batches(vals, batch_format="pyarrow"),
               ["event_type"], [("sum_k", "k", "sum")], small_result=True)


def bucketed_map_groups_events(events_ds, fn, n_buckets: int = N_BUCKETS):
    bucketed = events_ds.map_batches(
        lambda b: _bucket(b, "user_id", n_buckets), batch_format="pandas")
    return partition_map(bucketed, "__bucket",
                         lambda g: fn(g.drop(columns="__bucket")))


def next_event_join(events_ds, from_type: str = "view",
                    to_type: str = "purchase"):
    """For every ``from_type`` event, the FIRST strictly-later ``to_type``
    event of the same user (as-of forward join). Returns
    (event_id, user_id, next_event_id) with -1 when no successor exists
    (avoids nullable-int hashing ambiguity in the oracle compare)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["event_type"] == from_type] \
            .sort_values(["ts", "event_id"], kind="mergesort")
        right = g[g["event_type"] == to_type] \
            .sort_values(["ts", "event_id"], kind="mergesort") \
            .rename(columns={"event_id": "next_event_id"})
        if left.empty:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "user_id": pd.Series([], dtype="int64"),
                                 "next_event_id": pd.Series([], dtype="int64")})
        merged = pd.merge_asof(
            left, right[["ts", "user_id", "next_event_id"]],
            on="ts", by="user_id", direction="forward",
            allow_exact_matches=False)
        merged["next_event_id"] = merged["next_event_id"] \
            .fillna(-1).astype("int64")
        return merged[["event_id", "user_id", "next_event_id"]]

    bucketed = events_ds.map_batches(
        lambda b: _bucket(b, "user_id", N_BUCKETS), batch_format="pandas")
    return partition_map(bucketed, "__bucket", per_bucket)
