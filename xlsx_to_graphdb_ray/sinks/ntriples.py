"""N-Triples text sink (K1/K3 analogue — RDF output path).

The reference serializes triples to N-Triples bytes in batches and POSTs
them to GraphDB (``spreadsheet_loader.py:1027-1038`` ``batch_serialize`` →
``:415-434`` ``post_ntriples``). The rebuild's primary sink is partitioned
Parquet (resumable, columnar), but a user wanting actual RDF output gets it
here: a distributed ``BlockBasedFileDatasink`` emitting chunked ``.nt``
part files, with W3C N-Triples literal escaping, plus a ``triples_to_nt``
stage registered in the ``STAGE_REGISTRY`` sink-plugin seam.

Triple rows are the engine's standard layout: ``subj``/``pred`` IRIs,
``obj`` IRI-or-literal, ``obj_lit`` bool discriminator.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.datasource import BlockBasedFileDatasink

# N-Triples literal escapes (https://www.w3.org/TR/n-triples/#grammar):
# backslash first, then quote and control characters
_ESCAPES = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
            ("\r", "\\r"), ("\t", "\\t")]


def escape_literal(col: pa.Array) -> pa.Array:
    for raw, esc in _ESCAPES:
        col = pc.replace_substring(col, raw, esc)
    return col


def serialize_batch(b: pa.Table) -> bytes:
    """One Arrow triples block → N-Triples bytes (vectorized string ops).

    Nulls are rejected up front: this sink is a registered plugin seam, so
    arbitrary upstream stages can feed it — a null subj/pred/obj/obj_lit has
    no N-Triples serialization and silently coercing it would corrupt the
    graph (null obj_lit would quietly serialize a literal as an IRI)."""
    n = len(b)
    if n == 0:
        return b""
    for col in ("subj", "pred", "obj", "obj_lit"):
        nn = b[col].null_count
        if nn:
            raise ValueError(
                f"N-Triples sink: column {col!r} has {nn} null(s); "
                "triples must be fully populated (fill or filter upstream)")
    subj = b["subj"].combine_chunks() if isinstance(b["subj"], pa.ChunkedArray) \
        else b["subj"]
    pred = b["pred"].combine_chunks() if isinstance(b["pred"], pa.ChunkedArray) \
        else b["pred"]
    obj = b["obj"].combine_chunks() if isinstance(b["obj"], pa.ChunkedArray) \
        else b["obj"]
    lit = b["obj_lit"].to_numpy(zero_copy_only=False).astype(bool)

    # binary_join_element_wise treats its LAST argument as the separator —
    # pass "" to get plain element-wise concatenation
    iri_obj = pc.binary_join_element_wise("<", obj, "> .", "")
    lit_obj = pc.binary_join_element_wise('"', escape_literal(obj), '" .', "")
    obj_term = pc.if_else(pa.array(lit), lit_obj, iri_obj)

    lines = pc.binary_join_element_wise(
        "<", subj, "> <", pred, "> ", obj_term, "\n", "")
    return "".join(lines.to_pylist()).encode("utf-8")


class _NTFilenames:
    """Deterministic ``part-<task>-<block>.nt`` names (idempotent reruns —
    same contract as state.checkpoint.DeterministicFilenames)."""

    def get_filename_for_block(self, block, write_uuid, task_index,
                               block_index):
        return f"part-{task_index:05d}-{block_index:05d}.nt"

    def get_filename_for_row(self, row, write_uuid, task_index, block_index,
                             row_index):
        return (f"part-{task_index:05d}-{block_index:05d}"
                f"-{row_index:08d}.nt")


class NTriplesDatasink(BlockBasedFileDatasink):
    """Distributed N-Triples writer: one ``.nt`` part file per output block."""

    def __init__(self, path: str, **kwargs):
        kwargs.setdefault("filename_provider", _NTFilenames())
        super().__init__(path, file_format="nt", **kwargs)

    def write_block_to_file(self, block, file) -> None:
        file.write(serialize_batch(block.to_arrow()))


def write_ntriples(ds, out_dir: str, *, min_rows_per_file: int | None = None,
                   mode: str = "overwrite") -> str:
    """Write a triples Dataset as chunked N-Triples part files.

    ``mode="overwrite"`` clears pre-existing ``.nt`` part files first:
    deterministic part names alone only overwrite matching (task, block)
    indices, so a rerun producing FEWER blocks would leave stale parts mixed
    into the directory and any RDF consumer would read stale triples.
    ``mode="append"`` keeps existing parts (caller manages disjoint names).
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be 'overwrite' or 'append', got {mode!r}")
    if mode == "overwrite" and os.path.isdir(out_dir):
        for f in os.listdir(out_dir):
            if f.endswith(".nt"):
                os.unlink(os.path.join(out_dir, f))
    ds.write_datasink(NTriplesDatasink(
        out_dir, min_rows_per_file=min_rows_per_file), )
    return out_dir


def parse_ntriples(path: str) -> pa.Table:
    """Minimal N-Triples reader for round-trip tests: one file or directory
    → (subj, pred, obj, obj_lit) table. Handles the escapes this sink
    emits."""
    import os

    files = []
    if os.path.isdir(path):
        files = [os.path.join(path, f) for f in sorted(os.listdir(path))
                 if f.endswith(".nt")]
    else:
        files = [path]
    subj, pred, obj, obj_lit = [], [], [], []
    for fp in files:
        with open(fp, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                assert line.endswith(" .")
                body = line[:-2]
                s_end = body.index("> ")
                s = body[1:s_end]
                rest = body[s_end + 2:]
                p_end = rest.index("> ")
                p = rest[1:p_end]
                o_term = rest[p_end + 2:]
                if o_term.startswith("<"):
                    o, is_lit = o_term[1:-1], False
                else:
                    # unescape in ONE left-to-right pass (sequential
                    # str.replace would corrupt backslash-then-n sequences)
                    import re
                    unmap = {"\\\\": "\\", '\\"': '"', "\\n": "\n",
                             "\\r": "\r", "\\t": "\t"}
                    o = re.sub(r'\\[\\"nrt]', lambda m: unmap[m.group(0)],
                               o_term[1:-1])
                    is_lit = True
                subj.append(s)
                pred.append(p)
                obj.append(o)
                obj_lit.append(is_lit)
    return pa.table({"subj": pa.array(subj, pa.string()),
                     "pred": pa.array(pred, pa.string()),
                     "obj": pa.array(obj, pa.string()),
                     "obj_lit": pa.array(obj_lit, pa.bool_())})
