"""Per-turn mention / relation / tool extraction.

The analogue of the reference's sheet parsing + keyword predicates
(``spreadsheet_loader.py:54-111``, keyword filter
``scripts/data_processing/analyze_snowmobile_data.py:142-157``): a stateless
``map_batches`` transform (Arrow in → Arrow out) that explodes each turn into
extraction *events*:

    (conv_id, turn_idx, ord:int32, kind:{'m','r','t'}, a, b, pred)

- ``m``: one row per ``[[alias]]`` mention, ``a`` = raw alias text, ``ord`` =
  occurrence index within the turn (position order — the stable coordinate
  the anaphora stage and first-wins dedup rely on).
- ``r``: one row per turn matching a relation phrase ``[[a]] <relword>
  [[b]]`` (first occurrence per turn — one relation clause per turn is the
  grammar; the DuckDB oracle uses the same first-match semantics); ``pred``
  is the mapped ontology predicate. Operand aliases also appear as ``m``
  rows.
- ``t``: one row per tool turn; ``a`` = tool name, ``pred`` = ``usedTool``.

Implementation (hot path): no Python per row or per match. Mentions come
from ONE ``split_pattern`` pass on the opening delimiter plus numpy offset
math (every ``[[``-prefixed segment starts with an alias closed by ``]]``);
relations from one ``extract_regex`` pass. Everything is RE2 + Arrow
kernels in C++.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MENTION_RE = re.compile(r"\[\[([^\]]+)\]\]")  # scalar-side mirror of the grammar
_REL_PAT = (r"\[\[(?P<a>[^\]]+)\]\] "
            r"(?P<relword>includes|depends on|is replaced by|documents|aka) "
            r"\[\[(?P<b>[^\]]+)\]\]")
RELWORD_TO_PRED = {
    "includes": "hasComponent",       # cf. build_bom_triples, ref :920-925
    "depends on": "dependsOn",        # cf. DEPENDS_ON self-join, ref importer
    "is replaced by": "hasAlternate",  # cf. build_alternate_triples, ref :928-942
    "documents": "describes",         # cf. build_describe_triples, ref :955-960
    "aka": "sameAs",                  # canonicalization input (union-find merge)
}
_RELWORDS = pa.array(list(RELWORD_TO_PRED))
_RELPREDS = pa.array(list(RELWORD_TO_PRED.values()))

EVENT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("ord", pa.int32()),
    ("kind", pa.string()),
    ("a", pa.string()),
    ("b", pa.string()),
    ("pred", pa.string()),
])


def _events_table(conv, tidx, ordi: int, kind: str, a, b=None, pred=None):
    n = len(conv)
    return pa.table({
        "conv_id": conv,
        "turn_idx": tidx,
        "ord": pa.array(np.full(n, ordi, dtype=np.int32)),
        "kind": pa.array(np.full(n, kind, dtype=object), pa.string()),
        "a": a,
        "b": b if b is not None else pa.nulls(n, pa.string()),
        "pred": pred if pred is not None else pa.nulls(n, pa.string()),
    }).cast(EVENT_SCHEMA)


def extract_events(batch: pa.Table) -> pa.Table:
    """Arrow batch of turns → Arrow batch of extraction events."""
    batch = batch.combine_chunks()
    text = pc.fill_null(batch["text"], "")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    conv = batch["conv_id"].combine_chunks() \
        if isinstance(batch["conv_id"], pa.ChunkedArray) else batch["conv_id"]
    tidx = batch["turn_idx"].combine_chunks() \
        if isinstance(batch["turn_idx"], pa.ChunkedArray) else batch["turn_idx"]
    parts: list[pa.Table] = []

    # mentions — ONE split on the opening delimiter, then numpy offset math:
    # every "[["-prefixed segment starts with an alias terminated by "]]"
    pieces = pc.split_pattern(text, "[[")
    if isinstance(pieces, pa.ChunkedArray):
        pieces = pieces.combine_chunks()
    counts = pc.list_value_length(pieces).to_numpy()
    if counts.sum() > len(counts):  # any mention at all
        flat = pc.list_flatten(pieces)
        row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        elem_idx = np.arange(len(flat), dtype=np.int64) - starts[row_idx]
        keep = elem_idx >= 1  # segment 0 is the text before the first "[["
        tails = flat.filter(pa.array(keep))
        seg = pc.split_pattern(tails, "]]", max_splits=1)
        closed = pc.greater(pc.list_value_length(seg), 1)  # had a "]]"
        alias = pc.list_element(seg.filter(closed), 0)
        kept_rows = row_idx[keep][np.asarray(closed)]
        kept_ord = (elem_idx[keep] - 1)[np.asarray(closed)]
        ridx = pa.array(kept_rows)
        n = len(alias)
        parts.append(pa.table({
            "conv_id": conv.take(ridx),
            "turn_idx": tidx.take(ridx),
            "ord": pa.array(kept_ord.astype(np.int32)),
            "kind": pa.array(np.full(n, "m", dtype=object), pa.string()),
            "a": alias,
            "b": pa.nulls(n, pa.string()),
            "pred": pa.nulls(n, pa.string()),
        }).cast(EVENT_SCHEMA))

    # relations — first relation clause per turn
    rel = pc.extract_regex(text, _REL_PAT)
    rvalid = pc.is_valid(rel)
    if pc.any(rvalid).as_py():
        sub = batch.filter(rvalid)
        r = rel.filter(rvalid)
        relword = pc.struct_field(r, "relword")
        pred = pc.take(_RELPREDS, pc.index_in(relword, _RELWORDS))
        parts.append(_events_table(
            sub["conv_id"], sub["turn_idx"], 0, "r",
            pc.struct_field(r, "a"), pc.struct_field(r, "b"), pred))

    # tool turns
    tvalid = pc.is_valid(batch["tool"])
    if pc.any(tvalid).as_py():
        sub = batch.filter(tvalid)
        n_t = len(sub)
        parts.append(_events_table(
            sub["conv_id"], sub["turn_idx"], 0, "t", sub["tool"],
            pred=pa.array(np.full(n_t, "usedTool", dtype=object), pa.string())))

    if not parts:
        return EVENT_SCHEMA.empty_table()
    return pa.concat_tables(parts).combine_chunks()


def topic_turns(batch: pa.Table, topics: list[str]) -> pa.Table:
    """Keyword predicate filter (M5 analogue, ref
    ``analyze_snowmobile_data.py:142-157``): turns whose text contains any
    topic keyword, emitted as (conv_id, turn_idx, topic)."""
    pat = "(?P<topic>" + "|".join(re.escape(t) for t in topics) + ")$"
    # topics are appended as the final token by the generator; a generic
    # engine would use match_substring — anchored here to avoid matching
    # entity names that happen to contain a topic word.
    topic = pc.extract_regex(batch["text"], pat)
    ok = pc.is_valid(topic)
    t = batch.filter(ok)
    topic_vals = pc.struct_field(topic.filter(ok), "topic")
    return pa.table({
        "conv_id": t["conv_id"],
        "turn_idx": t["turn_idx"],
        "topic": topic_vals,
    })
