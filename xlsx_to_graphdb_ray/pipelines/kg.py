"""Flagship pipeline: transcripts → (subj, pred, obj) triple Parquet.

End-to-end re-expression of the reference's ``import_data``
(``spreadsheet_loader.py:1355-1524``: parse → cross-index → resolve →
derive → serialize → POST) as a streaming Ray Data pipeline:

    read_parquet(turns)
      → map_batches(extract_events)           [pyarrow, stateless tasks]
      → groupby(conv_id).map_groups(anaphora) [order-sensitive, small events]
      → map_batches(Resolver, actor pool)     [broadcast entity dictionary]
      →  ═ checkpoint: events_resolved/ ═
      → branches: sameAs → connected components → canonical map (broadcast)
                  mentions → first-mention groupby → entity triples
                  relations → relation + reverse usedIn triples
                  hasComponent edges → semi-naïve closure → partOfAssembly
                  tool events → usedTool triples
      → union → first-wins dedup (groupby Min(prov))
      →  ═ checkpoint: triples/ ═  (partitionable by pred; K1 sink analogue)

Stage boundaries are resumable Parquet checkpoints with fingerprint
manifests (state/checkpoint.py); branches read the checkpoint instead of
re-executing shared lineage.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Min

from .. import synth
from ..functions.normalize import ONT, RDFS_LABEL
from ..stages import triples as T
from ..stages.anaphora import substitute_anaphora
from ..stages.canonicalize import canonical_mapper, sameas_components
from ..stages.closure import transitive_closure
from ..stages.dictionary import build_lookup_dicts
from ..stages.extract import extract_events
from ..stages.resolve import resolve_events
from ..state.checkpoint import checkpoint_dataset, file_fingerprint

PIPELINE_VERSION = "4"

CKPT_ROOT = "/tmp/graft_ckpt"

# predicates whose object is a literal (for obj_lit re-derivation post-dedup)
_LIT_PREDS = {ONT + "name", RDFS_LABEL, ONT + "hasRevision",
              ONT + "inContainer", ONT + "usedTool"}


def workdir(sf_dir: str) -> str:
    return os.path.join(CKPT_ROOT,
                        os.path.basename(os.path.normpath(sf_dir)),
                        "v" + PIPELINE_VERSION)


def _fingerprint(paths: dict[str, str]) -> str:
    return "|".join([PIPELINE_VERSION,
                     file_fingerprint(paths["turns"]),
                     file_fingerprint(paths["entities"])])


def resolved_events(sf_dir: str) -> ray.data.Dataset:
    """Checkpointed: extraction events with resolution columns attached."""
    paths = synth.ensure_synth(sf_dir)
    fp = _fingerprint(paths)

    def make():
        turns = ray.data.read_parquet(
            paths["turns"], columns=["conv_id", "turn_idx", "text", "tool"])
        events = turns.map_batches(extract_events, batch_format="pyarrow")
        events = substitute_anaphora(events)
        lookups = build_lookup_dicts(paths["entities"])
        return resolve_events(events, lookups)

    return checkpoint_dataset(
        make, os.path.join(workdir(sf_dir), "events_resolved"), fp)


def canonical_delta(sf_dir: str) -> pd.DataFrame:
    """sameAs connected-components delta map (entity_id → canon_id ≠ self).

    Cached as a small parquet next to the checkpoints.
    """
    cache = os.path.join(workdir(sf_dir), "canonical_delta.parquet")
    if os.path.exists(cache):
        return pd.read_parquet(cache)
    ev = resolved_events(sf_dir)
    pairs = ev.filter(
        expr="kind == 'r' and pred == 'sameAs' and a_status == 'resolved' "
             "and b_status == 'resolved'"
    ).select_columns(["a_id", "b_id"])
    delta = sameas_components(pairs)
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    tmp = cache + f".tmp.{os.getpid()}"
    delta.to_parquet(tmp)
    os.replace(tmp, cache)
    return delta


def _entities_lookup(sf_dir: str) -> pd.DataFrame:
    paths = synth.ensure_synth(sf_dir)
    import pyarrow.parquet as pq
    return pq.read_table(paths["entities"]).to_pandas().set_index("entity_id")


def build_triples(sf_dir: str, *, include_closure: bool = True,
                  dedup: bool = True) -> ray.data.Dataset:
    """The full triple set (pre-checkpoint Dataset)."""
    ev = resolved_events(sf_dir)
    delta = canonical_delta(sf_dir)
    canon = canonical_mapper(delta)
    ent_lookup = _entities_lookup(sf_dir)
    ent_ref = ray.put(ent_lookup)

    # --- mentions → first-mention per canonical entity → entity triples
    def mention_rows(b: pd.DataFrame) -> pd.DataFrame:
        m = b[(b["kind"] == "m") & (b["a_status"] == "resolved")]
        return pd.DataFrame({
            "canon_id": canon(m["a_id"]),
            "prov": T.pk_series(m["conv_id"], m["turn_idx"]),
        })

    first_mention = (
        ev.map_batches(mention_rows, batch_format="pandas")
        .groupby("canon_id").aggregate(Min("prov", alias_name="prov"))
    )

    class EntityTriples:
        """Actor: entity attrs fetched once, fan-out per batch (F1)."""

        def __init__(self, ent_ref):
            self.ent = ray.get(ent_ref) if isinstance(ent_ref, ray.ObjectRef) \
                else ent_ref

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            attrs = self.ent.reindex(b["canon_id"])
            merged = pd.DataFrame({
                "canon_id": b["canon_id"].values,
                "prov": b["prov"].values,
                "name": attrs["name"].values,
                "part_type": attrs["part_type"].values,
                "view": attrs["view"].values,
                "state": attrs["state"].values,
                "source": attrs["source"].values,
                "revision": attrs["revision"].values,
                "container": attrs["container"].values,
            })
            return T.entity_triples_batch(merged)

    entity_triples = first_mention.map_batches(
        EntityTriples, fn_constructor_kwargs={"ent_ref": ent_ref},
        batch_format="pandas", concurrency=(1, 4))

    # --- relations (both endpoints resolved, sameAs consumed upstream)
    def relation_rows(b: pd.DataFrame) -> pd.DataFrame:
        r = b[(b["kind"] == "r") & (b["pred"] != "sameAs")
              & (b["a_status"] == "resolved") & (b["b_status"] == "resolved")]
        return pd.DataFrame({
            "pred": r["pred"],
            "a_canon": canon(r["a_id"]),
            "b_canon": canon(r["b_id"]),
            "prov": T.pk_series(r["conv_id"], r["turn_idx"]),
        })

    rel_rows = ev.map_batches(relation_rows, batch_format="pandas")
    relation_triples = rel_rows.map_batches(
        T.relation_triples_batch, batch_format="pandas")

    # --- tool provenance triples
    tool_triples = ev.filter(expr="kind == 't'").map_batches(
        T.tool_triples_batch, batch_format="pandas")

    parts = [entity_triples, relation_triples, tool_triples]

    # --- transitive closure over canonical hasComponent edges (A6)
    if include_closure:
        comp_edges = rel_rows.filter(expr="pred == 'hasComponent'") \
            .map_batches(lambda b: pd.DataFrame(
                {"parent": b["a_canon"], "child": b["b_canon"]}),
                batch_format="pandas")
        paths_ds = transitive_closure(comp_edges)
        parts.append(paths_ds.map_batches(
            T.closure_triples_batch, batch_format="pandas"))

    all_triples = parts[0]
    for p in parts[1:]:
        all_triples = all_triples.union(p)
    if not dedup:
        return all_triples

    deduped = T.dedup_first_wins(all_triples)

    def add_obj_lit(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["obj_lit"] = b["pred"].isin(_LIT_PREDS)
        return b[T.TRIPLE_COLS]

    return deduped.map_batches(add_obj_lit, batch_format="pandas")


def triples_dataset(sf_dir: str) -> ray.data.Dataset:
    """Checkpointed final triple table."""
    paths = synth.ensure_synth(sf_dir)
    fp = _fingerprint(paths)
    return checkpoint_dataset(
        lambda: build_triples(sf_dir),
        os.path.join(workdir(sf_dir), "triples"), fp)


def write_triples(sf_dir: str, out_dir: str) -> str:
    """Materialize the K1-analogue sink: pred-partitioned Parquet.

    Replaces the reference's N-Triples POST loop
    (``spreadsheet_loader.py:1512-1522``) with deterministic partitioned
    Parquet (resumable, idempotent overwrite).
    """
    ds = triples_dataset(sf_dir)

    def short_pred(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        sp = pc.replace_substring_regex(b["pred"], r"^.*[:#]", "")
        return b.append_column("pred_short", sp)

    ds.map_batches(short_pred, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["pred_short"])
    return out_dir
