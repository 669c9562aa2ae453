"""S6 — OData-style temporal version source with $top/$skip paging.

Re-expression of the reference's Windchill OData client
(``scripts/windchill_odata_temporal_import.py:47-106``): an entity-set
GET with ``$select``/``$filter``/``$top`` query options, a ``value``
list in every answer, errors counted-and-swallowed (an unreachable set
yields zero rows, not an exception), and the reference's two-format
timestamp parse (``/Date(ms)/`` OData-legacy and ISO-8601, bad input
→ epoch 0, :106-118). The reference fetches one bounded page
(``MAX_PARTS``); this source generalizes it to a full ``$top``/``$skip``
paging loop so an arbitrarily large entity set streams through.

Differences from the reference, by design:

- **Transport is pluggable and local** (same pattern as
  ``sources/changes_rpc.py``): the sandbox has no network, so
  ``LocalODataTransport`` serves an entity set from a JSON document at
  ``<root>/<EntitySet>.json`` and applies the ``$select/$filter/$skip/
  $top`` options the way the remote server would — the *reader* above it
  only ever sees one page per request, so the paging loop is exercised
  exactly as over HTTP. An HTTP transport slots in behind the same
  ``count()``/``get()`` interface on a networked cluster.
- **Pages fetch in parallel when the set size is known.** OData servers
  expose ``/$count``; when the transport answers it, the page offsets
  are planned up front and each page is fetched inside its own Ray task
  (``from_items(skips) → map_batches``), so page latency overlaps across
  the cluster instead of serializing on the driver the way the
  reference's single-session loop does. When ``count()`` is unsupported
  the reader falls back to the reference's shape — a sequential
  skip/short-page loop — bounded by ``max_rows``.
- **Rate limiting is a hook.** ``throttle`` (seconds, or a callable)
  runs between consecutive page requests of one planner/worker — the
  knob the reference hard-codes as a request timeout.
"""

from __future__ import annotations

import json
import os
import time
from datetime import datetime, timezone

import numpy as np
import pandas as pd
import pyarrow as pa


def parse_odata_timestamp(value) -> int:
    """Epoch seconds from either OData-legacy ``/Date(1234567890000)/``
    or ISO-8601 (``Z`` accepted); anything unparseable → 0
    (ref ``windchill_odata_temporal_import.py:106-118``)."""
    if not value or not isinstance(value, str):
        return 0
    try:
        if value.startswith("/Date(") and value.endswith(")/"):
            return int(value[6:-2]) // 1000
        dt = datetime.fromisoformat(value.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp())
    except (ValueError, OverflowError):
        return 0


class LocalODataTransport:
    """File-backed stand-in for the OData server: one JSON document per
    entity set at ``<root>/<EntitySet>.json`` holding ``{"value": [...]}``;
    ``get()`` applies ``$filter`` (``Field eq 'literal'`` only — the one
    shape the reference emits), ``$select``, ``$skip`` and ``$top``
    server-side, exactly like a remote endpoint would, and ``count()``
    answers the OData ``/$count`` probe. A missing document raises
    (connection model), so fallback paths are exercised for real."""

    def __init__(self, root: str):
        self.root = root

    def _rows(self, entity_set: str, filter: str | None) -> list[dict]:
        path = os.path.join(self.root, f"{entity_set}.json")
        if not os.path.exists(path):
            raise ConnectionError(f"{self.root}: no such entity set "
                                  f"{entity_set}")
        with open(path, encoding="utf-8") as f:
            rows = json.load(f).get("value", [])
        if filter:
            field, _, literal = filter.partition(" eq ")
            literal = literal.strip().strip("'")
            rows = [r for r in rows if str(r.get(field.strip())) == literal]
        return rows

    def count(self, entity_set: str, filter: str | None = None) -> int:
        return len(self._rows(entity_set, filter))

    def get(self, entity_set: str, select: str | None = None,
            filter: str | None = None, top: int | None = None,
            skip: int = 0) -> list[dict]:
        rows = self._rows(entity_set, filter)[skip:]
        if top is not None:
            rows = rows[:top]
        if select:
            keep = [c.strip() for c in select.split(",")]
            rows = [{k: r.get(k) for k in keep} for r in rows]
        return rows


class NoCountTransport(LocalODataTransport):
    """A server that rejects the ``/$count`` probe — forces the reader's
    sequential short-page fallback (used by tests; real servers exist
    that disable $count)."""

    def count(self, entity_set: str, filter: str | None = None) -> int:
        raise ConnectionError("$count not supported")


def _throttle_fn(throttle):
    if throttle is None:
        return lambda: None
    if callable(throttle):
        return throttle
    return lambda: time.sleep(throttle)


def fetch_entity_set(transport_factory, entity_set: str,
                     select: str | None = None, filter: str | None = None,
                     page_size: int = 1000, max_rows: int | None = None,
                     throttle=None):
    """All rows of one entity set as a ``ray.data.Dataset`` of raw OData
    records (one JSON-string column ``record`` — field sets vary per
    server, so typing happens downstream in the schema mapper).

    ``transport_factory`` is a zero-arg picklable callable — each Ray
    task builds its OWN transport (a session is per-worker state, the
    reference's ``requests.Session`` equivalent). Planner: ``count()``
    known → page offsets fan out as parallel tasks; unknown → sequential
    driver loop that stops on the first short page (the reference's
    bounded single fetch, :47-80, generalized)."""
    import ray.data as rd

    gate = _throttle_fn(throttle)
    probe = transport_factory()
    try:
        total = probe.count(entity_set, filter)
    except Exception:
        total = None

    if total is not None:
        if max_rows is not None:
            total = min(total, max_rows)
        skips = list(range(0, total, page_size))
        if not skips:
            return rd.from_items([], override_num_blocks=1) \
                .map_batches(lambda b: pd.DataFrame({"record":
                                                     pd.Series([], str)}),
                             batch_format="pandas")

        def fetch_pages(b: pd.DataFrame) -> pd.DataFrame:
            tr = transport_factory()
            out, first = [], True
            for s in b["skip"]:
                if not first:
                    gate()
                first = False
                top = min(page_size, total - int(s))
                try:
                    rows = tr.get(entity_set, select=select, filter=filter,
                                  top=top, skip=int(s))
                except Exception:
                    rows = []     # ref: error → count-and-empty, not raise
                out.extend(json.dumps(r, sort_keys=True) for r in rows)
            return pd.DataFrame({"record": pd.Series(out, dtype=str)})

        return rd.from_items([{"skip": s} for s in skips]) \
            .map_batches(fetch_pages, batch_format="pandas")

    # no $count: the reference's sequential shape — page until short page
    records, skip = [], 0
    while max_rows is None or len(records) < max_rows:
        if skip:
            gate()
        top = page_size if max_rows is None \
            else min(page_size, max_rows - len(records))
        try:
            rows = probe.get(entity_set, select=select, filter=filter,
                             top=top, skip=skip)
        except Exception:
            break
        records.extend(json.dumps(r, sort_keys=True) for r in rows)
        if len(rows) < top:
            break
        skip += len(rows)
    return rd.from_items([{"record": r} for r in records]) if records \
        else rd.from_items([{"record": ""}]).filter(lambda r: False)


# OData property names (ref Documents $select list :94-99) → the
# ``versions`` side-table schema consumed by pipelines/temporal.py.
VERSION_SELECT = "ID,Number,Version,Iteration,State,Modifier,CreatedOn"


def versions_from_odata(root: str, entity_set: str = "WTParts",
                        page_size: int = 1000, max_rows: int | None = None,
                        throttle=None, transport_cls=LocalODataTransport):
    """The ``versions`` table (entity_id, version, iteration, full_id,
    state, modifier, created_date) pulled through the paging reader —
    drop-in for the parquet side table in ``pipelines/temporal.py``.
    ``$select`` prunes to the seven needed properties at the server, the
    paging/typing both run inside Ray tasks, and the OData two-format
    timestamp becomes a proper ``timestamp[us]`` column."""

    def factory():
        return transport_cls(root)

    raw = fetch_entity_set(factory, entity_set, select=VERSION_SELECT,
                           page_size=page_size, max_rows=max_rows,
                           throttle=throttle)

    def to_schema(b: pd.DataFrame) -> pa.Table:
        recs = [json.loads(r) for r in b["record"]]
        ts = np.array([parse_odata_timestamp(r.get("CreatedOn"))
                       for r in recs], dtype="int64")
        return pa.table({
            "entity_id": pa.array([str(r.get("Number", "")) for r in recs],
                                  pa.string()),
            "version": pa.array([str(r.get("Version", "")) for r in recs],
                                pa.string()),
            "iteration": pa.array([int(r.get("Iteration", 0))
                                   for r in recs], pa.int32()),
            "full_id": pa.array([str(r.get("ID", "")) for r in recs],
                                pa.string()),
            "state": pa.array([str(r.get("State", "")) for r in recs],
                              pa.string()),
            "modifier": pa.array([str(r.get("Modifier", "")) for r in recs],
                                 pa.string()),
            "created_date": pa.array(ts * 1_000_000).cast(
                pa.timestamp("us")),
        })

    return raw.map_batches(to_schema, batch_format="pandas")


def write_versions_fixture(versions: pa.Table, root: str,
                           entity_set: str = "WTParts") -> str:
    """Serialize a ``versions`` table into the OData answer document the
    local transport serves (test/demo fixture: epoch-us timestamps become
    the legacy ``/Date(ms)/`` wire form the reference parses)."""
    df = versions.to_pandas()
    ms = (df["created_date"].astype("int64") // 1000).astype("int64")
    rows = [{"ID": r.full_id, "Number": r.entity_id, "Version": r.version,
             "Iteration": int(r.iteration), "State": r.state,
             "Modifier": r.modifier, "CreatedOn": f"/Date({m})/"}
            for r, m in zip(df.itertuples(index=False), ms)]
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, f"{entity_set}.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump({"value": rows}, f)
    return path
