"""Order-sensitive per-conversation anaphora resolution.

The rebuild's analogue of the reference's level-stack hierarchical parse
(``spreadsheet_loader.py:1160-1182`` — a sequential scan whose correctness
depends on input order). Here the order-coupled rule is: a mention whose
alias is ``"that one"`` refers to the most recent *non-anaphoric* mention at
a strictly earlier (turn_idx, ord, kind) position within the same
conversation.

Scale design (two deliberate choices):

1. The stage runs on the **extracted event stream**, not the raw turns — the
   shuffle moves only small event rows, a fraction of the input bytes.
2. Conversations are grouped by a **hash bucket** (``conv_bucket =
   stable_hash(conv_id) % n_buckets``), not by conv_id directly: one
   Python call per co-located partition (``shuffle.partition_map``)
   instead of one per conversation, with all per-conversation work done by
   *vectorized* pandas ``groupby(conv_id)`` kernels inside the partition.
   Bucketing by hash also spreads conversations evenly, so no single group
   is hot.

Never relies on global block order (SURVEY.md §4 "Ordering") — every bucket
sorts by the stable (conv_id, turn_idx, ord, kind) coordinates itself.
"""

from __future__ import annotations

import pandas as pd
import pandas.util
import pyarrow as pa

ANAPHOR = "that one"
N_BUCKETS = 64


def add_conv_bucket(batch: pd.DataFrame, n_buckets: int = N_BUCKETS) -> pd.DataFrame:
    batch = batch.copy()
    batch["conv_bucket"] = (
        pandas.util.hash_pandas_object(batch["conv_id"], index=False)
        % n_buckets
    ).astype("int32")
    return batch


def _add_conv_bucket_arrow(batch: pa.Table,
                           n_buckets: int = N_BUCKETS) -> pa.Table:
    from .shuffle import _bucket_col
    return batch.append_column(
        "conv_bucket", _bucket_col(batch, ["conv_id"], n_buckets))


def resolve_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """One hash-bucket of conversations → anaphors substituted, vectorized.

    Works on the mention projection (no ``kind`` column) or on a full event
    frame (non-mention rows pass through as carrier-transparent).
    """
    sort_cols = ["conv_id", "turn_idx", "ord"]
    if "kind" in g.columns:
        sort_cols = sort_cols + ["kind"]
    g = g.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    is_m = (g["kind"] == "m") if "kind" in g.columns \
        else pd.Series(True, index=g.index)
    is_ana = is_m & (g["a"] == ANAPHOR)
    carrier = g["a"].where(is_m & ~is_ana)
    by_conv = carrier.groupby(g["conv_id"], sort=False)
    prev = by_conv.ffill().groupby(g["conv_id"], sort=False).shift(1)
    g.loc[is_ana, "a"] = prev[is_ana]
    # an anaphor with no antecedent stays unresolvable → keep marker (unknown)
    g["a"] = g["a"].fillna(ANAPHOR)
    return g.drop(columns=["conv_bucket"], errors="ignore")


def substitute_anaphora(events_ds, n_buckets: int = N_BUCKETS):
    """Dataset of events → Dataset with anaphors replaced by antecedents.

    The bucket column is attached on Arrow blocks so the hash exchange
    ships Arrow (zero-copy) instead of pickled pandas — measured 20%
    faster at the sf2 tier; the substitution runs as vectorized pandas
    over whole co-located partitions (``shuffle.partition_map``).
    """
    from .shuffle import partition_map
    bucketed = events_ds.map_batches(
        lambda b: _add_conv_bucket_arrow(b, n_buckets),
        batch_format="pyarrow")
    return partition_map(bucketed, "conv_bucket", resolve_bucket)
