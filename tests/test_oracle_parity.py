"""Driver-style correctness gate, run locally at sf0.001.

Mimics the harness: run each ``queries()`` callable and its DuckDB oracle on
the same inputs, then compare row-count, column names, and the
order-insensitive value multiset.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod
from xlsx_to_graphdb_ray.pipelines.oracles import kg_oracles
from xlsx_to_graphdb_ray.pipelines.oracles_shared import shared_oracles

SF_DIR = "/root/testdata/sf0.001"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]) or \
                pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort") \
        .reset_index(drop=True)


@pytest.fixture(scope="module")
def oracles():
    out = kg_oracles(SF_DIR)
    out.update(shared_oracles(SF_DIR))
    return out


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF_DIR}/{t}.parquet')")
    return c


ALL_QUERIES = entrymod.queries()
ROWS_ONLY = ("ann_ivf_topk", "vecs_near_dup_lsh", "vecs_kmeans_train",
             "vecs_dup_clusters_lsh", "vecs_dedup_corpus_lsh")
ORACLED = [n for n in ALL_QUERIES if n not in ROWS_ONLY]


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(ray_session, oracles, con, name):
    res = ALL_QUERIES[name](SF_DIR)
    ray_df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    ora_df = con.sql(oracles[name]).df()
    a, b = normalize(ray_df), normalize(ora_df)
    assert list(a.columns) == list(b.columns), (a.columns, b.columns)
    assert len(a) == len(b), f"{name}: rows {len(a)} vs oracle {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(ray_session, name):
    res = ALL_QUERIES[name](SF_DIR)
    df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    assert len(df) > 0
