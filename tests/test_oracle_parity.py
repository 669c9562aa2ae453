"""Driver-style correctness gate, run locally at sf0.001.

Mimics the harness: run each ``queries()`` callable and its DuckDB oracle on
the same inputs, then compare row-count, column names, and the
order-insensitive value multiset.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from xlsx_to_graphdb_ray.pipelines import queries as q
from xlsx_to_graphdb_ray.pipelines.oracles import kg_oracles

SF_DIR = "/root/testdata/sf0.001"

QUERIES = {
    "kg_mentions": q.kg_mentions,
    "kg_resolution_status": q.kg_resolution_status,
    "kg_sameas_canon": q.kg_sameas_canon,
    "kg_first_mention": q.kg_first_mention,
    "kg_closure": q.kg_closure,
    "kg_triples": q.kg_triples,
    "kg_pred_counts": q.kg_pred_counts,
    "kg_topic_turns": q.kg_topic_turns,
    "kg_tool_usage": q.kg_tool_usage,
}


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort") \
        .reset_index(drop=True)


@pytest.fixture(scope="module")
def oracles():
    return kg_oracles(SF_DIR)


@pytest.mark.parametrize("name", list(QUERIES))
def test_query_matches_oracle(ray_session, oracles, name):
    res = QUERIES[name](SF_DIR)
    ray_df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    ora_df = duckdb.sql(oracles[name]).df()
    a, b = normalize(ray_df), normalize(ora_df)
    assert list(a.columns) == list(b.columns), (a.columns, b.columns)
    assert len(a) == len(b), f"{name}: rows {len(a)} vs oracle {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
