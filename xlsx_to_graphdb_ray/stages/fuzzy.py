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

import numpy as np
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
    """Actor-pool callable: batch of (nalias) → (nalias, entity_id, score).

    Per block (first token) the actor lazily builds an inverted
    token→candidate-index posting list once; each probe then scores ALL
    candidates with one numpy ``bincount`` accumulation instead of per-
    candidate Python set ops (~20× faster on wide blocks).
    """

    def __init__(self, index_ref):
        self.index = ray.get(index_ref) \
            if isinstance(index_ref, ray.ObjectRef) else index_ref
        self._block_cache: dict = {}

    def _block(self, tok0: str):
        blk = self._block_cache.get(tok0)
        if blk is None:
            cands = self.index.get(tok0, [])
            inverted: dict[str, list[int]] = {}
            sizes = np.empty(len(cands), dtype=np.int64)
            ids = []
            for i, (eid, toks) in enumerate(cands):
                ids.append(eid)
                sizes[i] = len(toks)
                for t in toks:
                    inverted.setdefault(t, []).append(i)
            inverted = {t: np.asarray(v, dtype=np.int64)
                        for t, v in inverted.items()}
            blk = (ids, sizes, inverted)
            self._block_cache[tok0] = blk
        return blk

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for nalias in batch["nalias"]:
            toks = list(dict.fromkeys(nalias.split(" ")))
            ids, sizes, inverted = self._block(toks[0])
            if not ids:
                continue
            shared = np.zeros(len(ids), dtype=np.int64)
            for t in toks:
                post = inverted.get(t)
                if post is not None:
                    shared[post] += 1
            union = len(toks) + sizes - shared
            scores = shared / union
            best = scores.max()
            if best >= MIN_SCORE and int((scores == best).sum()) == 1:
                w = int(scores.argmax())
                rows.append((nalias, ids[w], round(float(best), 6)))
        return pd.DataFrame(rows, columns=["nalias", "entity_id", "score"])


def fuzzy_resolve_unknowns(unknown_alias_ds, entities_df: pd.DataFrame,
                           concurrency=(1, 8)):
    """Dataset of distinct (nalias) → Dataset (nalias, entity_id, score)."""
    ref = ray.put(build_block_index(entities_df))
    return unknown_alias_ds.map_batches(
        FuzzyResolver, fn_constructor_kwargs={"index_ref": ref},
        batch_format="pandas", concurrency=concurrency)
