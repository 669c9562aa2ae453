"""Entity-dictionary build (T1/T2 analogue).

The reference builds ``pn_to_name`` / ``name_to_pn`` dicts in a sequential
pass over all sheets (``spreadsheet_loader.py:113-150``, ``build_name_index``
``:1041-1052``). Here the dictionary is built as a Ray Data aggregation over
the entity dimension table and then **broadcast once** (``ray.put``) into the
resolver actor pool — never re-shipped per batch.

Keys are ``norm_key(name)`` (trim+lower+float-collapse — the shared spec in
``functions.normalize``); values are the candidate entity-id lists, so
ambiguity (≥2 ids for one name, cf. ref ``:1070-1075``) is preserved, and a
separate ``norm(id) -> id`` map supports the reference's number-fallback path
(``:1063-1066``).

Scale note: the dictionary is assumed to fit in one worker's heap (entity
dimensions are orders of magnitude smaller than the turn stream; the
reference's was a single Python dict too). If it ever didn't, the resolve
stage becomes a hash-partitioned join on ``norm_key`` instead of a broadcast
— same semantics, documented trade.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions.normalize import norm_key_array


def build_dictionary_tables(entities_ds) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Dataset of entities → (name_index, id_index) pandas frames.

    name_index: (nname, ids:list[str], n_cand:int) — one row per normalized
    name. id_index: (nid, entity_id). Built with a Ray groupby so the build
    itself scales; the *result* is small and is collected to the driver.
    """

    def add_norm(batch: pa.Table) -> pa.Table:
        return batch.append_column("nname", norm_key_array(batch["name"]))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one Python call per BUCKET (not per name); the per-name list
        # collection runs inside pandas' grouped aggregation
        agg = g.groupby("nname", sort=False)["entity_id"] \
            .agg(lambda s: sorted(s.tolist()))
        return pd.DataFrame({
            "nname": agg.index,
            "ids": agg.values,
            "n_cand": [len(set(x)) for x in agg.values],
        })

    from .shuffle import bucketed_map_groups
    normed = entities_ds.map_batches(add_norm, batch_format="pyarrow")
    name_index = bucketed_map_groups(
        normed.select_columns(["nname", "entity_id"]), ["nname"],
        per_bucket, n_buckets=16).to_pandas()
    ids = entities_ds.select_columns(["entity_id"]).to_pandas()
    id_index = pd.DataFrame({
        "nid": ids["entity_id"].str.strip().str.lower(),
        "entity_id": ids["entity_id"],
    })
    return name_index, id_index


def as_lookup_dicts(name_index: pd.DataFrame, id_index: pd.DataFrame):
    """Materialize the broadcastable lookup structures."""
    name_to_ids = dict(zip(name_index["nname"], name_index["ids"]))
    id_map = dict(zip(id_index["nid"], id_index["entity_id"]))
    return {"name_to_ids": name_to_ids, "id_map": id_map}


def build_lookup_dicts(entities_path: str) -> dict:
    """Fast path: build the lookup dicts from the entity Parquet directly.

    The dictionary must fit on the driver to be broadcast at all, so for
    dimension tables below broadcast scale this pandas build avoids two Ray
    shuffles. ``build_dictionary_tables`` remains the Ray-native build (same
    semantics, tested for equality) for entity dimensions that need one.
    """
    import numpy as np
    import pyarrow.parquet as pq

    from ..functions.normalize import norm_key_array

    tbl = pq.read_table(entities_path, columns=["entity_id", "name"])
    nname = norm_key_array(tbl["name"]).to_pandas().astype(object)
    df = pd.DataFrame({"n": nname, "id": tbl["entity_id"].to_pandas()})
    # grouped id lists without a per-group Python apply: mergesort once,
    # then slice contiguous runs (ids come out sorted within each name)
    df = df.sort_values(["n", "id"], kind="mergesort")
    n_arr = df["n"].to_numpy(dtype=object)
    id_arr = df["id"].to_numpy(dtype=object)
    if len(n_arr):
        starts = np.flatnonzero(np.r_[True, n_arr[1:] != n_arr[:-1]])
        ends = np.r_[starts[1:], len(n_arr)]
        name_to_ids = {n_arr[s]: list(id_arr[s:e])
                       for s, e in zip(starts, ends)}
    else:
        name_to_ids = {}
    ids = tbl["entity_id"].to_pandas()
    id_map = dict(zip(ids.str.strip().str.lower(), ids))
    return {"name_to_ids": name_to_ids, "id_map": id_map}
