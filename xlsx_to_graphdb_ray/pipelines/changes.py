"""Change-record pipeline (the reference's enhanced/changes path).

Covers S4 (enhanced-data reader), M7 (change-column projection), M13
(change-type → label mapping, ``scripts/mcp/ingest_changes.py:20-30``), J7
(DEPENDS_ON: consecutive changes sharing an affected entity,
``snowmobile_neo4j_importer.py:290-326``) and J9 (fuzzy containment
matching: change text contains an entity name → link, capped at 5,
``ingest_changes.py:121-168``) over the deterministic synthetic changes
table.

The J9 containment semantics deliberately mirror the reference's naive
substring match (a name that is a prefix of another name can double-match —
a known quirk of the reference, preserved so both sides agree).
"""

from __future__ import annotations

import os

import pandas as pd
import ray
import ray.data

from .. import synth
from ..config import tune_context
from ..stages.shuffle import bucketed_map_groups, grouped_agg
from ..state.checkpoint import default_blocks

TYPE_LABELS = {"ECO": "ChangeOrder", "ECN": "ChangeNotice",
               "DEV": "Deviation", "REV": "Revision"}
MAX_TEXT_MATCHES = 5   # ref ingest_changes.py:144 matched[:5]


def _changes(sf_dir: str):
    tune_context()
    from ..state.checkpoint import read_parquet_auto
    return read_parquet_auto(synth.ensure_synth(sf_dir)["changes"])


def changes_by_type(sf_dir: str):
    """M13 + A2: count by mapped change label: (change_label, n)."""
    ds = _changes(sf_dir)

    def label(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "change_label": b["type"].map(TYPE_LABELS).fillna("Other")})

    return grouped_agg(ds.map_batches(label, batch_format="pandas"),
                       ["change_label"], [("n", None, "count")],
                       small_result=True)


def _containment_batch(b: pd.DataFrame, *, ent_ref) -> pd.DataFrame:
    """One Aho-Corasick pass per description: O(len(desc)) automaton steps
    regardless of dictionary size (vs the reference's per-entity substring
    sweep, ``ingest_changes.py:121-168``). The automaton is built once per
    worker process from the broadcast (id, name) list and cached by ref, the
    same warm-worker pattern as ``stages.resolve._resolve_batch``."""
    from ..functions.multimatch import AhoCorasick

    global _CONTAIN_CACHE
    try:
        cached_key, eids, ac = _CONTAIN_CACHE
    except NameError:
        cached_key = eids = ac = None
    key = ent_ref.hex() if isinstance(ent_ref, ray.ObjectRef) else id(ent_ref)
    if cached_key != key:
        pairs = ray.get(ent_ref) if isinstance(ent_ref, ray.ObjectRef) \
            else ent_ref
        eids = [p[0] for p in pairs]          # already entity_id-sorted
        ac = AhoCorasick([p[1] for p in pairs])
        _CONTAIN_CACHE = (key, eids, ac)

    desc = b["description"].fillna("")
    rows: list[tuple[str, str]] = []
    for cid, txt in zip(b["change_id"], desc):
        # cap = first MAX_TEXT_MATCHES matched entities in id order
        # (ref matched[:5] with an id-ordered entity sweep)
        for i in sorted(ac.scan(txt))[:MAX_TEXT_MATCHES]:
            rows.append((cid, eids[i]))
    return pd.DataFrame(rows, columns=["change_id", "entity_id"])


def changes_affects_links(sf_dir: str):
    """J9 containment links: (change_id, entity_id) for every entity whose
    canonical NAME appears as a substring of the change description, capped
    at the first ``MAX_TEXT_MATCHES`` entities by id per change.

    Semantics mirror the reference's naive substring match exactly
    (including the prefix double-match quirk); the implementation is a
    single multi-pattern automaton scan per description, not an
    O(entities × changes) sweep."""
    import pyarrow.parquet as pq

    paths = synth.ensure_synth(sf_dir)
    ents = pq.read_table(paths["entities"],
                         columns=["entity_id", "name"]).to_pandas() \
        .sort_values("entity_id")
    ent_ref = ray.put(list(zip(ents["entity_id"], ents["name"])))
    ds = _changes(sf_dir)
    return ds.map_batches(_containment_batch, fn_kwargs={"ent_ref": ent_ref},
                          batch_format="pandas")


def changes_depends_on(sf_dir: str):
    """J7 DEPENDS_ON: consecutive changes affecting the same entity,
    ordered by (create_date, change_id): (change_a, change_b, affected_id)."""
    ds = _changes(sf_dir)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["affected_id", "create_date", "change_id"],
                          kind="mergesort")
        nxt = g.groupby("affected_id", sort=False)["change_id"].shift(-1)
        keep = nxt.notna()
        return pd.DataFrame({
            "change_a": g["change_id"][keep],
            "change_b": nxt[keep],
            "affected_id": g["affected_id"][keep],
        })

    return bucketed_map_groups(
        ds.map_batches(
            lambda b: b[["change_id", "affected_id", "create_date"]],
            batch_format="pandas"),
        ["affected_id"], per_bucket, n_buckets=16)
