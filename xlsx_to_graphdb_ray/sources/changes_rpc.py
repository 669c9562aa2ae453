"""S5 — MCP/JSON-RPC change source with endpoint-fallback semantics.

Re-expression of the reference's per-part change fetch
(``src/importers/neo4j_importer.py:292-389``): for every part, a change
SEARCH is attempted against a chain of three route shapes — the JSON-RPC
``message`` envelope, the plain ``tools/call`` envelope, then the legacy
``tools/change_search`` shape — first non-empty answer wins; each found
change id is then DETAILED through the same three-route chain, fields are
coalesced case-insensitively (``number``/``Number`` …) with the
reference's defaults (type ``ChangeNotice``, state ``INWORK``, number
``ECN-<part>``), and ``AffectedObjects`` fan the row out per affected
part.

Differences from the reference, by design:
- **Transport is pluggable and local.** The sandbox has no network, so the
  default ``LocalJsonTransport`` serves each (route, query) from a JSON
  file under ``<endpoint>/<route>/<query>.json`` — a missing file models a
  refused connection, a malformed file a bad response; the fallback chain
  is exercised exactly as over HTTP. An HTTP transport slots in behind the
  same two-method interface on a networked cluster.
- **Parallel, not sequential.** The reference loops parts one POST at a
  time; here the parts table is a Dataset and the per-part chain runs
  inside ``map_batches`` tasks, so fetch latency overlaps across the
  cluster while per-endpoint state (the transport) is built once per task.
"""

from __future__ import annotations

import json
import os

import pandas as pd

# route order is the reference's fallback order
SEARCH_ROUTES = ("message", "tools_call", "change_search")
DETAIL_ROUTES = ("message", "tools_call", "change_get")
SEARCH_LIMIT = 50


class LocalJsonTransport:
    """File-backed transport: ``call(route, query)`` returns the parsed
    JSON at ``<root>/<route>/<query>.json`` or raises (connection model)."""

    def __init__(self, root: str):
        self.root = root

    def available(self) -> bool:
        return os.path.isdir(self.root)

    def call(self, route: str, query: str) -> dict:
        path = os.path.join(self.root, route, f"{query}.json")
        if not os.path.exists(path):
            raise ConnectionError(f"{self.root}: no answer on {route}")
        with open(path, encoding="utf-8") as f:
            return json.load(f)


def _search_items(transport, part: str) -> list:
    """Reference fallback chain for the change SEARCH (:305-327): first
    route returning a non-empty item list wins; errors mean 'try next'."""
    for route in SEARCH_ROUTES:
        try:
            data = transport.call(route, part)
        except Exception:
            continue
        if route == "message":                    # JSON-RPC envelope
            result = data.get("result") or data
            items = result.get("results") if isinstance(result, dict) else []
        elif route == "tools_call":
            items = data.get("results") or []
        else:                                     # legacy change_search
            items = data.get("results") or data.get("data") or []
        if items:
            return items[:SEARCH_LIMIT]
    return []


def _detail(transport, oid: str) -> dict:
    """Reference fallback chain for the change DETAIL (:333-360): the
    first route whose answer carries a number/Number field wins."""
    for route in DETAIL_ROUTES:
        try:
            data = transport.call(route, oid)
        except Exception:
            continue
        result = data.get("result") or data
        if isinstance(result, dict) and \
                (result.get("number") or result.get("Number")):
            return result
    return {}


def _coalesce(detail: dict, item: dict, key: str, default=None):
    return (detail.get(key) or detail.get(key.capitalize())
            or item.get(key) or item.get(key.capitalize()) or default)


def fetch_changes(parts_ds, endpoints: list[str],
                  container: str | None = None):
    """(number, type, state, name, source, container, part) — one row per
    (change, affected part). ``parts_ds`` needs columns ``number`` (part
    id) and optionally ``container``; ``endpoints`` are transport roots
    probed in order per part (first reachable endpoint serves that part's
    whole chain — the reference's single-URL behaviour generalized to an
    endpoint list)."""

    def per_batch(b: pd.DataFrame) -> pd.DataFrame:
        transports = [LocalJsonTransport(e) for e in endpoints]
        rows = []
        containers = b["container"] if "container" in b.columns \
            else pd.Series([None] * len(b))
        cont_by_part = dict(zip(b["number"].astype(str), containers))
        for pn, cont in cont_by_part.items():
            items = []
            for tr in transports:
                if not tr.available():
                    continue
                items = _search_items(tr, pn)
                if items:
                    transport = tr
                    break
            for ch in items:
                oid = ch.get("oid") or ch.get("id")
                if not oid:
                    continue
                d = _detail(transport, str(oid))
                num = _coalesce(d, ch, "number", f"ECN-{pn}")
                typ = _coalesce(d, ch, "type", "ChangeNotice")
                state = _coalesce(d, ch, "state", "INWORK")
                name = _coalesce(d, ch, "name")
                affected = d.get("AffectedObjects") or []
                targets = [str(ao.get("number") or ao.get("Number") or pn)
                           for ao in affected] or [pn]
                for apn in targets:
                    rows.append((str(num), str(typ), str(state), name,
                                 "mcp",
                                 cont_by_part.get(apn, cont) or container,
                                 apn))
        return pd.DataFrame(rows, columns=[
            "number", "type", "state", "name", "source", "container",
            "part"])

    return parts_ds.map_batches(per_batch, batch_format="pandas")
