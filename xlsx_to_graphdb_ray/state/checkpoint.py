"""Stage-boundary checkpoints with lineage manifests (resumable runs).

The reference has no checkpointing — a failed POST aborts the whole run and
re-running relies on GraphDB/Cypher MERGE idempotency (SURVEY.md §4,
``spreadsheet_loader.py:1518-1520``, ``docs/IMPORTING.md:45-46``). The
rebuild replaces that with deterministic Parquet stage checkpoints:

- each checkpoint is a directory of part files written ATOMICALLY (write to a
  ``.tmp-<pid>`` sibling, fsync-rename into place), plus a ``_manifest.json``
  recording the input fingerprint, row count, and pipeline version;
- a rerun with the same fingerprint reads the checkpoint instead of
  recomputing — a crashed run resumes at the last completed stage;
- a fingerprint mismatch (input or code changed) invalidates and recomputes.

This also serves the single-session execution plan: branches of the pipeline
that fan out from one intermediate (events → {entity, relation, tool, sameAs}
branches) read the checkpoint instead of re-executing shared lineage.
"""

from __future__ import annotations

import json
import os
import shutil

import ray.data

MANIFEST = "_manifest.json"


class DeterministicFilenames:
    """Stable part-file names (``part-<task>-<block>.parquet``) so reruns
    overwrite instead of accumulating UUID-named files — the sink-side
    idempotency the reference got from Cypher MERGE (SURVEY.md §7.4)."""

    def get_filename_for_block(self, block, write_uuid, task_index,
                               block_index):
        return f"part-{task_index:05d}-{block_index:05d}.parquet"

    def get_filename_for_row(self, row, write_uuid, task_index, block_index,
                             row_index):
        return (f"part-{task_index:05d}-{block_index:05d}"
                f"-{row_index:08d}.parquet")


def file_fingerprint(path: str) -> str:
    # full resolved path + size + nanosecond mtime: a same-size regeneration
    # within the same second, or two sf_dirs whose files coincide in
    # basename/size, must NOT validate a stale checkpoint
    real = os.path.realpath(path)
    st = os.stat(real)
    return f"{real}:{st.st_size}:{st.st_mtime_ns}"


def is_valid(ckpt_dir: str, fingerprint: str) -> bool:
    mf = os.path.join(ckpt_dir, MANIFEST)
    if not os.path.exists(mf):
        return False
    try:
        with open(mf) as f:
            meta = json.load(f)
        return meta.get("fingerprint") == fingerprint
    except (json.JSONDecodeError, OSError):
        return False


def checkpoint_dataset(make_ds, ckpt_dir: str, fingerprint: str,
                       **write_kwargs) -> "ray.data.Dataset":
    """Return a Dataset backed by ``ckpt_dir``; (re)compute only when the
    manifest's fingerprint doesn't match.

    ``make_ds`` is a zero-arg callable producing the Dataset to persist.
    """
    if not is_valid(ckpt_dir, fingerprint):
        tmp = ckpt_dir.rstrip("/") + f".tmp-{os.getpid()}"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        ds = make_ds()
        ds.write_parquet(tmp, **write_kwargs)
        import pyarrow.parquet as pq
        rows = sum(pq.read_metadata(os.path.join(tmp, p)).num_rows
                   for p in os.listdir(tmp) if p.endswith(".parquet"))
        with open(os.path.join(tmp, MANIFEST), "w") as f:
            json.dump({"fingerprint": fingerprint, "rows": rows}, f)
        if os.path.exists(ckpt_dir):
            shutil.rmtree(ckpt_dir)
        os.replace(tmp, ckpt_dir)
    files = [os.path.join(ckpt_dir, p) for p in sorted(os.listdir(ckpt_dir))
             if p.endswith(".parquet")]
    try:
        with open(os.path.join(ckpt_dir, MANIFEST)) as f:
            rows = int(json.load(f).get("rows", 0))
    except (OSError, json.JSONDecodeError, ValueError):
        rows = 0
    blocks = blocks_for(rows) if rows else default_blocks()
    return ray.data.read_parquet(files, override_num_blocks=blocks)


def default_blocks() -> int:
    """Target block count ≈ 2×CPUs: enough for balance, few enough that
    per-task dispatch latency doesn't dominate sub-second UDFs."""
    try:
        import ray
        if ray.is_initialized():
            return max(8, 2 * int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        pass
    return 16


def blocks_for(rows: int, rows_per_block: int = 2048) -> int:
    """Rows-aware block count: ≥8 (keep small tables parallel), ≤2×CPUs,
    and ≥``rows_per_block`` rows per block — per-task dispatch costs ~20 ms
    on this box, so a 5k-row side table split 64 ways is dispatch-bound,
    not compute-bound, at the 2048 default. Stages whose per-row work is
    heavy (md5 shingling ≈ 200 µs/doc) pass a smaller ``rows_per_block``
    so small tables still fan out to every CPU. (On a real cluster, size
    blocks to ~64 MB instead.)"""
    return max(8, min(default_blocks(), rows // rows_per_block or 8))


def read_parquet_auto(path, columns=None,
                      rows_per_block: int = 2048) -> "ray.data.Dataset":
    """``read_parquet`` with a rows-aware ``override_num_blocks``."""
    import pyarrow.parquet as pq
    rows = pq.read_metadata(path).num_rows
    return ray.data.read_parquet(
        path, columns=columns,
        override_num_blocks=blocks_for(rows, rows_per_block))
