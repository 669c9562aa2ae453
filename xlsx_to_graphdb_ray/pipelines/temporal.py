"""Temporal version-history operators (reference's temporal import path).

Re-expression of ``scripts/import_temporal_history.py:92-129`` (per-(version,
iteration) temporal nodes with ``full_identifier`` and ``is_latest``) and
``scripts/windchill_odata_temporal_import.py:228-247``
(``create_version_relationships``: EVOLVES_TO edges from each version to its
FIRST successor version of the same entity) as Ray Data operators over the
``versions`` side table:

- ``versions_latest`` — every version/iteration row plus the derived
  ``is_latest`` flag (true for the max (version, iteration) per entity);
- ``versions_evolves_to`` — (from_id, to_id) edges: each version/iteration
  row links to the head iteration of the entity's next distinct version.

Both are a single bucketed shuffle on ``entity_id``
(``bucketed_map_groups``), with all per-entity work vectorized inside the
bucket — the version dimension is entity-cardinality, so a hot entity only
costs its own version rows. Oracles: ``row_number()`` / ``lead()`` window
SQL in ``oracles_shared.temporal_oracles``.
"""

from __future__ import annotations

import pandas as pd
import ray.data

from .. import synth
from ..stages.shuffle import bucketed_map_groups

_N_BUCKETS = 16


def _versions(sf_dir: str):
    paths = synth.ensure_synth(sf_dir)
    from ..state.checkpoint import read_parquet_auto
    return read_parquet_auto(paths["versions"])


def versions_latest(sf_dir: str, versions_ds=None):
    """(entity_id, version, iteration, full_id, state, created_date,
    is_latest) — is_latest = max (version, iteration) per entity.
    ``versions_ds`` overrides the parquet side table (e.g. the S6 OData
    paging source, ``sources/odata.versions_from_odata``)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["entity_id", "version", "iteration"],
                          kind="mergesort").reset_index(drop=True)
        g["is_latest"] = g["entity_id"].ne(g["entity_id"].shift(-1))
        return g[["entity_id", "version", "iteration", "full_id", "state",
                  "created_date", "is_latest"]]

    src = versions_ds if versions_ds is not None else _versions(sf_dir)
    return bucketed_map_groups(src, ["entity_id"], per_bucket,
                               n_buckets=_N_BUCKETS)


def versions_evolves_to(sf_dir: str, versions_ds=None):
    """(from_id, to_id) — every version/iteration row EVOLVES_TO the first
    (head) iteration of the entity's next distinct version; rows of the
    entity's last version have no successor and are omitted.
    ``versions_ds`` overrides the parquet side table (S6 OData source)."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["entity_id", "version", "iteration"],
                          kind="mergesort").reset_index(drop=True)
        is_head = g["entity_id"].ne(g["entity_id"].shift()) \
            | g["version"].ne(g["version"].shift())
        heads = g.loc[is_head, ["entity_id", "version", "full_id"]] \
            .rename(columns={"full_id": "head_id"}).reset_index(drop=True)
        same_ent = heads["entity_id"].eq(heads["entity_id"].shift(-1))
        heads["next_head"] = heads["head_id"].shift(-1).where(same_ent)
        out = g.merge(heads[["entity_id", "version", "next_head"]],
                      on=["entity_id", "version"], how="left")
        out = out[out["next_head"].notna()]
        return pd.DataFrame({"from_id": out["full_id"],
                             "to_id": out["next_head"]}) \
            .reset_index(drop=True)

    src = versions_ds if versions_ds is not None else _versions(sf_dir)
    return bucketed_map_groups(src, ["entity_id"], per_bucket,
                               n_buckets=_N_BUCKETS)
