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

    def per_name(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["entity_id"].tolist())
        return pd.DataFrame({
            "nname": [g["nname"].iloc[0]],
            "ids": [ids],
            "n_cand": [len(set(ids))],
        })

    normed = entities_ds.map_batches(add_norm, batch_format="pyarrow")
    name_index = (
        normed.select_columns(["nname", "entity_id"])
        .groupby("nname")
        .map_groups(per_name, batch_format="pandas")
        .to_pandas()
    )
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
    import pyarrow.parquet as pq

    from ..functions.normalize import norm_key

    df = pq.read_table(entities_path,
                       columns=["entity_id", "name"]).to_pandas()
    nname = df["name"].map(norm_key)
    name_to_ids = {
        k: sorted(v)
        for k, v in df.groupby(nname)["entity_id"].apply(list).items()
    }
    id_map = dict(zip(df["entity_id"].str.strip().str.lower(),
                      df["entity_id"]))
    return {"name_to_ids": name_to_ids, "id_map": id_map}
