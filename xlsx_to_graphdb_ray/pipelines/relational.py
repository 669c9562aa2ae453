"""Relational operator coverage over the shared TPC-H-ish testdata tables.

Each query demonstrates an operator family from SURVEY.md §2 (aggregations
A1–A4/A7, broadcast join J3, grouped-HAVING A3, top-k, distinct-union D4)
as an idiomatic Ray Data pipeline; DuckDB oracles live in
``pipelines.oracles_shared``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..config import tune_context
from ..stages.shuffle import grouped_agg, grouped_distinct
from ..state.checkpoint import read_parquet_auto


def _read(sf_dir: str, table: str, columns=None):
    tune_context()
    return read_parquet_auto(os.path.join(sf_dir, f"{table}.parquet"),
                             columns=columns)


def pricing_summary(sf_dir: str):
    """TPC-H Q1-style grouped aggregate with in-block pre-combine (A1/A2).

    Columns: l_returnflag, l_linestatus, sum_qty, sum_base, sum_disc, n.
    Money sums are rounded to 2 decimals on both sides of the oracle check.
    """
    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def prep(b: pa.Table) -> pa.Table:
        disc = pc.multiply(b["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "qty": b["l_quantity"],
            "base": b["l_extendedprice"],
            "disc": disc,
        })

    agg = grouped_agg(li.map_batches(prep, batch_format="pyarrow"),
                      ["l_returnflag", "l_linestatus"],
                      [("sum_qty", "qty", "sum"),
                       ("sum_base", "base", "sum"),
                       ("sum_disc", "disc", "sum"),
                       ("n", None, "count")], small_result=True)

    def rnd(b: pd.DataFrame) -> pd.DataFrame:
        for c in ("sum_qty", "sum_base", "sum_disc"):
            b[c] = b[c].round(2)
        return b

    return agg.map_batches(rnd, batch_format="pandas")


def top_parts_by_usage(sf_dir: str, k: int = 10):
    """Top-k partkeys by lineitem count (A2: groupby → sort desc → limit),
    deterministic tie-break by partkey."""
    li = _read(sf_dir, "lineitem", ["l_partkey"])
    counts = grouped_agg(li, ["l_partkey"], [("n", None, "count")],
                         n_buckets=16)
    top = counts.sort(["n", "l_partkey"], descending=[True, False]).limit(k)
    return top


def parts_usage_having(sf_dir: str, threshold: int = 40):
    """Grouped count + HAVING filter (A3): partkeys in > threshold lineitems."""
    li = _read(sf_dir, "lineitem", ["l_partkey"])
    counts = grouped_agg(li, ["l_partkey"], [("n", None, "count")],
                         n_buckets=16)
    return counts.map_batches(
        lambda b: b.filter(pc.greater(b["n"], threshold)),
        batch_format="pyarrow")


def brand_revenue(sf_dir: str):
    """Broadcast hash join J3: lineitem × part (small side via ray.put),
    revenue by brand. No shuffle join — the dimension rides the object
    store once and each task maps l_partkey → p_brand vectorized."""
    import pyarrow.parquet as pq

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_brand"])
    brand_ref = ray.put(dict(zip(part["p_partkey"].to_pylist(),
                                 part["p_brand"].to_pylist())))
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount"])

    def enrich(b: pd.DataFrame, *, brand_ref) -> pd.DataFrame:
        brands = ray.get(brand_ref) if isinstance(brand_ref, ray.ObjectRef) \
            else brand_ref
        return pd.DataFrame({
            "p_brand": b["l_partkey"].map(brands),
            "rev": b["l_extendedprice"] * (1.0 - b["l_discount"]),
        })

    agg = grouped_agg(
        li.map_batches(enrich, fn_kwargs={"brand_ref": brand_ref},
                       batch_format="pandas"),
        ["p_brand"], [("revenue", "rev", "sum"), ("n", None, "count")],
        small_result=True)
    return agg.map_batches(
        lambda b: b.assign(revenue=b["revenue"].round(2)),
        batch_format="pandas")


def customer_order_totals_topk(sf_dir: str, k: int = 10):
    """Join + grouped sum + top-k: top customers by total order value,
    enriched with the customer name via a broadcast lookup."""
    import pyarrow.parquet as pq

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_name"])
    name_ref = ray.put(dict(zip(cust["c_custkey"].to_pylist(),
                                cust["c_name"].to_pylist())))
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    agg = grouped_agg(orders, ["o_custkey"],
                      [("total", "o_totalprice", "sum"),
                       ("n_orders", None, "count")], small_result=True)

    def finish(b: pd.DataFrame, *, name_ref) -> pd.DataFrame:
        names = ray.get(name_ref) if isinstance(name_ref, ray.ObjectRef) \
            else name_ref
        b = b.assign(c_name=b["o_custkey"].map(names),
                     total=b["total"].round(2))
        return b

    return agg.map_batches(finish, fn_kwargs={"name_ref": name_ref},
                           batch_format="pandas") \
        .sort(["total", "o_custkey"], descending=[True, False]).limit(k)


def distinct_active_nations(sf_dir: str):
    """Set op D4/A7: distinct nationkeys appearing in customers ∪ suppliers."""
    c = _read(sf_dir, "customer", ["c_nationkey"]).map_batches(
        lambda b: pa.table({"nationkey": pc.cast(b["c_nationkey"], pa.int32())}),
        batch_format="pyarrow")
    s = _read(sf_dir, "supplier", ["s_nationkey"]).map_batches(
        lambda b: pa.table({"nationkey": pc.cast(b["s_nationkey"], pa.int32())}),
        batch_format="pyarrow")
    return grouped_distinct(c.union(s), ["nationkey"], small_result=True)


def region_order_stats(sf_dir: str):
    """Multi-hop broadcast enrichment (J3 chained): orders → customer →
    nation → region, then count + rounded sum by region name."""
    import pyarrow.parquet as pq

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    nat_to_reg = dict(zip(nat["n_nationkey"].to_pylist(),
                          nat["n_regionkey"].to_pylist()))
    reg_name = dict(zip(reg["r_regionkey"].to_pylist(),
                        reg["r_name"].to_pylist()))
    cust_to_region = {
        ck: reg_name[nat_to_reg[nk]]
        for ck, nk in zip(cust["c_custkey"].to_pylist(),
                          cust["c_nationkey"].to_pylist())
    }
    ref = ray.put(cust_to_region)
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def enrich(b: pd.DataFrame, *, ref) -> pd.DataFrame:
        m = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        return pd.DataFrame({"r_name": b["o_custkey"].map(m),
                             "price": b["o_totalprice"]})

    agg = grouped_agg(
        orders.map_batches(enrich, fn_kwargs={"ref": ref},
                           batch_format="pandas"),
        ["r_name"], [("total", "price", "sum"), ("n", None, "count")],
        small_result=True)
    return agg.map_batches(
        lambda b: b.assign(total=b["total"].round(2)), batch_format="pandas")
