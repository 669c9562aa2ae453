"""Flagship pipeline stays oracle-green when resolve auto-dispatches to the
hash-partitioned scale path (entity dimension above the broadcast limit)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from xlsx_to_graphdb_ray.pipelines import kg

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def partitioned_resolve(monkeypatch, tmp_path):
    # limit 0 rows -> every entity dimension takes the partitioned path;
    # private checkpoint root so other tests' checkpoints aren't churned
    monkeypatch.setenv("GRAFT_BROADCAST_ENTITY_LIMIT", "0")
    monkeypatch.setattr(kg, "CKPT_ROOT", str(tmp_path / "ckpt"))


def test_partitioned_path_selected(partitioned_resolve):
    from xlsx_to_graphdb_ray import synth
    paths = synth.ensure_synth(SF)
    assert kg._entity_count(paths["entities"]) > kg._broadcast_limit()


def test_flagship_triples_oracle_green_partitioned(
        ray_session, partitioned_resolve):
    import __ray_entry__ as entrymod
    from xlsx_to_graphdb_ray.pipelines.oracles import kg_oracles

    res = entrymod.queries()["kg_triples"](SF)
    ray_df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    sql = kg_oracles(SF)["kg_triples"]
    ora_df = duckdb.sql(sql).df()

    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns), kind="mergesort") \
            .reset_index(drop=True)

    a, b = norm(ray_df), norm(ora_df)
    assert len(a) == len(b) > 0
    pd.testing.assert_frame_equal(a, b)
