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
- ``r``: one row per relation phrase ``[[a]] <relword> [[b]]``; ``pred`` is
  the mapped ontology predicate. Operand aliases also appear as ``m`` rows.
- ``t``: one row per tool turn; ``a`` = tool name, ``pred`` = ``usedTool``.

Implementation note (hot path, scale): instead of a Python loop running the
regex once per row, each batch's texts are joined into a single buffer with a
``\\x00`` separator and scanned with ONE compiled ``finditer`` pass; match
positions are mapped back to row indices with ``np.searchsorted``. This keeps
per-batch Python overhead O(#matches), not O(#rows).

The cross-turn anaphora rule is *not* handled here (stateless stage) — see
``stages.anaphora`` which runs on the much smaller event stream.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# mention + relation grammar (see synth.py docstring; single spaces by
# construction of the generator — the oracle SQL uses the same patterns)
MENTION_RE = re.compile(r"\[\[([^\]]+)\]\]")
RELATION_RE = re.compile(
    r"\[\[([^\]]+)\]\] (includes|depends on|is replaced by|documents|aka) "
    r"\[\[([^\]]+)\]\]"
)
RELWORD_TO_PRED = {
    "includes": "hasComponent",       # cf. build_bom_triples, ref :920-925
    "depends on": "dependsOn",        # cf. DEPENDS_ON self-join, ref importer
    "is replaced by": "hasAlternate",  # cf. build_alternate_triples, ref :928-942
    "documents": "describes",         # cf. build_describe_triples, ref :955-960
    "aka": "sameAs",                  # canonicalization input (union-find merge)
}

EVENT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("ord", pa.int32()),
    ("kind", pa.string()),
    ("a", pa.string()),
    ("b", pa.string()),
    ("pred", pa.string()),
])

SEP = "\x00"


def _scan(texts: list[str], pattern: re.Pattern):
    """One-pass regex scan over a batch: returns (row_idx, match) arrays."""
    blob = SEP.join(texts)
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    np.cumsum(lens + 1, out=offsets[1:])
    matches = list(pattern.finditer(blob))
    if not matches:
        return np.empty(0, dtype=np.int64), []
    starts = np.fromiter((m.start() for m in matches), dtype=np.int64,
                         count=len(matches))
    rows = np.searchsorted(offsets, starts, side="right") - 1
    return rows, matches


def extract_events(batch: pa.Table) -> pa.Table:
    """Arrow batch of turns → Arrow batch of extraction events."""
    texts = batch["text"].to_pylist()
    conv = batch["conv_id"]
    tidx = batch["turn_idx"]
    n = len(texts)
    texts = ["" if t is None else t for t in texts]

    out_row: list[int] = []
    out_ord: list[int] = []
    out_kind: list[str] = []
    out_a: list[str | None] = []
    out_b: list[str | None] = []
    out_pred: list[str | None] = []

    # mentions — position order within each row gives `ord`
    m_rows, m_matches = _scan(texts, MENTION_RE)
    prev_row, ordi = -1, 0
    for r, m in zip(m_rows.tolist(), m_matches):
        ordi = ordi + 1 if r == prev_row else 0
        prev_row = r
        out_row.append(r)
        out_ord.append(ordi)
        out_kind.append("m")
        out_a.append(m.group(1))
        out_b.append(None)
        out_pred.append(None)

    # relations — ≤1 per turn by the generator's grammar, but the scan is
    # generic: every non-overlapping occurrence becomes an event
    r_rows, r_matches = _scan(texts, RELATION_RE)
    for r, m in zip(r_rows.tolist(), r_matches):
        out_row.append(r)
        out_ord.append(0)
        out_kind.append("r")
        out_a.append(m.group(1))
        out_b.append(m.group(3))
        out_pred.append(RELWORD_TO_PRED[m.group(2)])

    # tool turns
    tool_col = batch["tool"]
    valid = pc.is_valid(tool_col)
    t_rows = np.flatnonzero(np.asarray(valid))
    tools = tool_col.to_pylist()
    for r in t_rows.tolist():
        out_row.append(r)
        out_ord.append(0)
        out_kind.append("t")
        out_a.append(tools[r])
        out_b.append(None)
        out_pred.append("usedTool")

    idx = pa.array(out_row, pa.int64())
    return pa.table({
        "conv_id": pc.take(conv, idx).combine_chunks()
        if isinstance(conv, pa.ChunkedArray) else conv.take(idx),
        "turn_idx": pc.take(tidx, idx).combine_chunks()
        if isinstance(tidx, pa.ChunkedArray) else tidx.take(idx),
        "ord": pa.array(out_ord, pa.int32()),
        "kind": pa.array(out_kind, pa.string()),
        "a": pa.array(out_a, pa.string()),
        "b": pa.array(out_b, pa.string()),
        "pred": pa.array(out_pred, pa.string()),
    }).cast(EVENT_SCHEMA)


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
