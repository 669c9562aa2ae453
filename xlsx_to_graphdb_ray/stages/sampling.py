"""Deterministic hash-based sampling and dataset splitting.

The standard training-data operations for carving a corpus: a stable
train/val/test assignment and a Bernoulli subsample, both keyed on
``md5(doc_id)`` so that (a) membership is reproducible run-over-run and
engine-over-engine (the DuckDB oracles recompute the same md5), and
(b) the operator is embarrassingly parallel — pure per-row kernels, no
shuffle, no driver state, which is exactly what you want at 100 TB
(sampling SHOULD be the cheapest stage in the pipeline).

A salt string namespaces independent draws: ``hash_sample`` uses a salt so
its 5% is NOT the first 5% of the train split (independent membership).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

TRAIN_PCT = 80
VAL_PCT = 10
SAMPLE_PCT = 5
SAMPLE_SALT = "s|"


def _hash_pct(ids, salt: str = "") -> np.ndarray:
    """md5-derived bucket in [0, 100) per id — one md5 per row (ids are
    unique, so the token-style memoization used elsewhere has no hits)."""
    md5 = hashlib.md5
    enc = salt.encode() if salt else b""
    return np.fromiter(
        (int(md5(enc + str(i).encode()).hexdigest()[:8], 16) % 100
         for i in ids),
        dtype=np.int64, count=len(ids))


def hash_split(docs_ds, train_pct: int = TRAIN_PCT, val_pct: int = VAL_PCT):
    """(doc_id, split) — deterministic train/val/test assignment:
    bucket = md5(doc_id) % 100; < train_pct → 'train', < train+val →
    'val', else 'test'."""

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        h = _hash_pct(b["doc_id"])
        split = np.where(h < train_pct, "train",
                         np.where(h < train_pct + val_pct, "val", "test"))
        return pd.DataFrame({"doc_id": b["doc_id"].astype("int64"),
                             "split": split})

    return docs_ds.map_batches(assign, batch_format="pandas")


def hash_sample(docs_ds, pct: int = SAMPLE_PCT, salt: str = SAMPLE_SALT):
    """(doc_id) — deterministic ~pct% Bernoulli subsample by salted
    md5(doc_id); independent of ``hash_split`` membership via the salt."""

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        keep = _hash_pct(b["doc_id"], salt=salt) < pct
        return pd.DataFrame(
            {"doc_id": b["doc_id"].to_numpy()[keep].astype("int64")})

    return docs_ds.map_batches(pick, batch_format="pandas")


N_SHARDS = 8
SHUFFLE_SALT = "sh|"


def shuffle_shards(docs_ds, n_shards: int = N_SHARDS,
                   salt: str = SHUFFLE_SALT):
    """(doc_id, shard, pos) — deterministic global corpus shuffle into
    training shards: the "randomize example order before training" step,
    reproducible run-over-run and engine-over-engine. Each doc gets
    ``key = md5(salt|doc_id)``; ``shard = int(key[:8], 16) % n_shards``;
    ``pos`` = rank of (key, doc_id) within the shard — reading shards in
    pos order IS the shuffled corpus order.

    Scale shape: shard assignment is a pure per-row kernel; the only
    exchange is one bucketed co-location by shard, inside which ranking is
    a vectorized mergesort + cumcount (never a global sort of the corpus,
    and no driver state at all). Shards are the unit a trainer streams, so
    the in-shard rank is exactly the ordering granularity needed."""
    from .shuffle import bucketed_map_groups

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        md5 = hashlib.md5
        enc = salt.encode()
        ids = b["doc_id"].astype("int64")
        keys = np.asarray([md5(enc + str(i).encode()).hexdigest()
                           for i in ids], dtype=object)
        h = np.fromiter((int(k[:8], 16) for k in keys), dtype=np.int64,
                        count=len(keys))
        return pd.DataFrame({"doc_id": ids.to_numpy(), "k": keys,
                             "shard": h % n_shards})

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        # a bucket may hold several complete shards — rank within each
        g = g.sort_values(["shard", "k", "doc_id"], kind="mergesort")
        pos = g.groupby("shard", sort=False).cumcount()
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy().astype("int64"),
            "shard": g["shard"].to_numpy().astype("int64"),
            "pos": pos.to_numpy().astype("int64")})

    return bucketed_map_groups(
        docs_ds.map_batches(keyed, batch_format="pandas"), ["shard"], rank)


STRATUM_TARGET = 10
STRATUM_SALT = "b|"
_PERMYRIAD = 10_000


def _hash_permyriad(ids, salt: str = "") -> np.ndarray:
    """md5-derived bucket in [0, 10000) per id — finer granularity than
    ``_hash_pct`` so fractional per-stratum rates stay faithful."""
    md5 = hashlib.md5
    enc = salt.encode() if salt else b""
    return np.fromiter(
        (int(md5(enc + str(i).encode()).hexdigest()[:8], 16) % _PERMYRIAD
         for i in ids),
        dtype=np.int64, count=len(ids))


def stratified_sample(docs_ds, by: str = "source",
                      target: int = STRATUM_TARGET,
                      salt: str = STRATUM_SALT):
    """(doc_id, stratum) — rebalance a corpus by downsampling each stratum
    (e.g. source) toward ``target`` docs: keep a doc when its salted
    md5 permyriad bucket < floor(target·10000 / stratum_count). Expected
    kept per stratum ≈ min(target, count); membership is deterministic
    and engine-independent (the DuckDB oracle recomputes the same md5).

    Scale shape: pass 1 is a tiny pre-combined (stratum, count) aggregate;
    pass 2 broadcasts the O(#strata) rate table and filters per row — no
    shuffle of the corpus, no driver state beyond the rate table."""
    import ray

    from .shuffle import grouped_agg

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(by, as_index=False).size() \
            .rename(columns={"size": "n"})

    counts = grouped_agg(
        docs_ds.map_batches(count_partial, batch_format="pandas"),
        [by], [("n", "n", "sum")], small_result=True) \
        .to_pandas(limit=2_000_000).set_index(by)["n"]
    rates = np.minimum(target * _PERMYRIAD // counts, _PERMYRIAD)
    rates_ref = ray.put(rates)

    def pick(b: pd.DataFrame, *, rates_ref) -> pd.DataFrame:
        r = ray.get(rates_ref) if isinstance(rates_ref, ray.ObjectRef) \
            else rates_ref
        thresh = r.reindex(b[by]).to_numpy()
        keep = _hash_permyriad(b["doc_id"], salt=salt) < thresh
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy()[keep].astype("int64"),
            "stratum": b[by].to_numpy()[keep]})

    return docs_ds.map_batches(pick, fn_kwargs={"rates_ref": rates_ref},
                               batch_format="pandas")
