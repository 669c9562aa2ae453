"""Triple materialization (F1–F7 analogues) + first-wins exact dedup (D1).

Builders mirror the reference's generators, vectorized over batches:

- entity triples  ← ``build_part_triples`` (``spreadsheet_loader.py:878-917``):
  3 fixed (rdf:type, ont:name, rdfs:label) + conditional
  hasPartType/hasView/hasState/hasSource/hasRevision/inContainer.
- relation triples ← ``build_bom_triples`` ``:920-925`` (hasComponent),
  ``build_alternate_triples`` ``:928-942``, ``build_describe_triples``
  ``:955-960``, plus dependsOn (change-graph analogue).
- usedIn          ← ``build_used_in_triples`` ``:963-977`` — the reverse of
  every hasComponent edge (column swap, pure projection).
- partOfAssembly  ← closure stage (see stages/closure.py).
- usedTool        ← conversation-level tool provenance (transcript-specific).

Dedup semantics follow D1 (``edges = list(dict.fromkeys(edges))``,
``spreadsheet_loader.py:1221``): first occurrence wins — made deterministic
under parallelism by keying "first" on the stable provenance coordinate
``pk = conv_id ':' zero-padded turn_idx`` and taking ``Min(pk)`` per
(subj, pred, obj). Min is an algebraic aggregate, so Ray pre-combines per
block before the shuffle; an extra in-batch pandas pre-combine shrinks the
shuffled rows further (hot triples collapse to one row per block — this is
the skew story for the dedup shuffle: no per-group row materialization, so
hot keys cost O(blocks), not O(occurrences)).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.normalize import ONT, RDF_TYPE, RDFS_LABEL
from .shuffle import grouped_agg

TRIPLE_COLS = ["subj", "pred", "obj", "obj_lit", "prov"]

TRIPLE_SCHEMA = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("obj_lit", pa.bool_()),
    ("prov", pa.string()),
])

ENTITY_NS = "urn:entity:"
CONV_NS = "urn:conv:"

# predicate-name → full predicate URI (short partition-friendly name kept for
# the parquet partition column; cf. K1/K4 sinks in SURVEY.md §2.1)
REL_PREDS = ("hasComponent", "dependsOn", "hasAlternate", "describes")


def pk_series(conv_id: pd.Series, turn_idx: pd.Series) -> pd.Series:
    return conv_id.astype(str) + ":" + turn_idx.astype("int64").astype(str).str.zfill(6)


def _frame(subj, pred: str, obj, lit: bool, prov) -> pd.DataFrame:
    return pd.DataFrame({
        "subj": subj, "pred": pred, "obj": obj,
        "obj_lit": lit, "prov": prov,
    })


def entity_triples_batch(batch: pd.DataFrame, ns: str = ENTITY_NS,
                         type_label: str = "Entity") -> pd.DataFrame:
    """(canon_id, prov, name, part_type, view, state, source, revision,
    container) batch → fan-out entity triples (≤9 per entity, ref :878-917).

    ``ns``/``type_label`` select the URI scheme: ``urn:entity:``/Entity for
    the transcript graft, ``urn:part:``/Part for the reference-parity
    tabular path (ref URI minting :881).
    """
    subj = ns + batch["canon_id"].astype(str)
    name = batch["name"].fillna(batch["canon_id"])
    prov = batch["prov"]
    out = [
        _frame(subj, RDF_TYPE, ONT + type_label, False, prov),
        _frame(subj, ONT + "name", name, True, prov),
        _frame(subj, RDFS_LABEL, name, True, prov),
    ]
    for col, pred, lit, uri_obj in (
        ("part_type", "hasPartType", False, True),
        ("view", "hasView", False, True),
        ("state", "hasState", False, True),
        ("source", "hasSource", False, True),
        ("revision", "hasRevision", True, False),
        ("container", "inContainer", True, False),
    ):
        mask = batch[col].notna()
        if not mask.any():
            continue
        obj = batch.loc[mask, col].astype(str)
        if uri_obj:
            obj = ONT + obj
        out.append(_frame(subj[mask], ONT + pred, obj, lit, prov[mask]))
    return pd.concat(out, ignore_index=True)[TRIPLE_COLS]


def relation_triples_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Resolved relation events → direct relation triples + reverse usedIn.

    Expects columns (pred, a_canon, b_canon, prov); both endpoints resolved.
    """
    subj = ENTITY_NS + batch["a_canon"].astype(str)
    obj = ENTITY_NS + batch["b_canon"].astype(str)
    prov = batch["prov"]
    out = [pd.DataFrame({
        "subj": subj, "pred": ONT + batch["pred"].astype(str), "obj": obj,
        "obj_lit": False, "prov": prov,
    })]
    comp = batch["pred"] == "hasComponent"
    if comp.any():
        # build_used_in_triples (ref :963-977): swap subject/object
        out.append(_frame(obj[comp], ONT + "usedIn", subj[comp], False,
                          prov[comp]))
    return pd.concat(out, ignore_index=True)[TRIPLE_COLS]


def tool_triples_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Tool events → (urn:conv:<id>, ont:usedTool, tool-literal)."""
    return _frame(
        CONV_NS + batch["conv_id"].astype(str),
        ONT + "usedTool",
        batch["a"].astype(str),
        True,
        pk_series(batch["conv_id"], batch["turn_idx"]),
    )[TRIPLE_COLS]


def closure_triples_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Closure pairs (anc, desc) → (desc, partOfAssembly, anc) — the
    reference yields descendant-subject triples (ref :1018-1024). Derived
    rows carry empty provenance."""
    return _frame(
        ENTITY_NS + batch["desc"].astype(str),
        ONT + "partOfAssembly",
        ENTITY_NS + batch["anc"].astype(str),
        False,
        "",
    )[TRIPLE_COLS]


def dedup_first_wins(triples_ds):
    """Global first-wins dedup on (subj, pred, obj), min provenance.

    Uses the bucketed two-phase aggregate (stages/shuffle.py): partials
    collapse hot triples to one row per block before the exchange.
    """
    return grouped_agg(triples_ds, ["subj", "pred", "obj"],
                       [("prov", "prov", "min")])
