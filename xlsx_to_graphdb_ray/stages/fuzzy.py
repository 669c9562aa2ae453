"""Fuzzy name resolution: normalized-key blocking + similarity scoring.

The north-star's "name-resolution join re-expressed as normalized-key
blocking plus fuzzy-match scoring inside stateful actor pools holding the
entity dictionary" — the tier AFTER exact/number-fallback resolution fails
(J9 family; cf. the reference's containment matching,
``scripts/mcp/ingest_changes.py:121-168``).

Spec (shared with the DuckDB oracle, numerically exact — scores are ratios
of small ints):

- candidate block = entities whose normalized name shares the alias's FIRST
  token (blocking keeps each probe to one posting list, not the dictionary),
- score = Jaccard of the distinct token sets,
- accept iff the best score ≥ ``MIN_SCORE`` **and** the argmax is unique
  (ties are ambiguity → stay unresolved).

Physical design: the blocked token index is built once from the entity
dimension and held in actor state (``concurrency=(1, N)``); probes are the
small DISTINCT set of unresolved aliases, so the pool sees each alias once.
"""

from __future__ import annotations

import pandas as pd
import ray

from ..functions.normalize import norm_key

MIN_SCORE = 0.5


def build_block_index(entities_df: pd.DataFrame) -> dict:
    """norm-name first-token → [(entity_id, frozenset(tokens))...]"""
    index: dict[str, list[tuple[str, frozenset]]] = {}
    for eid, name in zip(entities_df["entity_id"], entities_df["name"]):
        toks = norm_key(name).split(" ")
        index.setdefault(toks[0], []).append((eid, frozenset(toks)))
    return index


def score_alias(nalias: str, index: dict):
    """→ (entity_id, score) or None per the accept rule."""
    toks = nalias.split(" ")
    cands = index.get(toks[0])
    if not cands:
        return None
    aset = frozenset(toks)
    best_eid, best, n_at_best = None, -1.0, 0
    for eid, eset in cands:
        inter = len(aset & eset)
        union = len(aset | eset)
        s = inter / union if union else 0.0
        if s > best:
            best_eid, best, n_at_best = eid, s, 1
        elif s == best:
            n_at_best += 1
    if best >= MIN_SCORE and n_at_best == 1:
        return best_eid, best
    return None


class FuzzyResolver:
    """Actor-pool callable: batch of (nalias) → (nalias, entity_id, score)."""

    def __init__(self, index_ref):
        self.index = ray.get(index_ref) \
            if isinstance(index_ref, ray.ObjectRef) else index_ref

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for nalias in batch["nalias"]:
            hit = score_alias(nalias, self.index)
            if hit is not None:
                rows.append((nalias, hit[0], round(hit[1], 6)))
        return pd.DataFrame(rows, columns=["nalias", "entity_id", "score"])


def fuzzy_resolve_unknowns(unknown_alias_ds, entities_df: pd.DataFrame,
                           concurrency=(1, 8)):
    """Dataset of distinct (nalias) → Dataset (nalias, entity_id, score)."""
    ref = ray.put(build_block_index(entities_df))
    return unknown_alias_ds.map_batches(
        FuzzyResolver, fn_constructor_kwargs={"index_ref": ref},
        batch_format="pandas", concurrency=concurrency)
