"""S6 OData paging source — paging, fallback, timestamp, schema parity."""

import json
import os

import pandas as pd
import pytest

from xlsx_to_graphdb_ray.sources.odata import (
    LocalODataTransport, NoCountTransport, fetch_entity_set,
    parse_odata_timestamp, versions_from_odata, write_versions_fixture)


@pytest.fixture(scope="module")
def odata_root(tmp_path_factory):
    """Fixture endpoint serving the sf0.001 synthetic versions table."""
    from xlsx_to_graphdb_ray import synth
    import pyarrow.parquet as pq
    paths = synth.ensure_synth("/root/testdata/sf0.001")
    root = str(tmp_path_factory.mktemp("odata"))
    write_versions_fixture(pq.read_table(paths["versions"]), root)
    return root


def test_timestamp_both_wire_formats_and_garbage():
    """Ref windchill_odata_temporal_import.py:106-118 — legacy /Date(ms)/,
    ISO-8601 (Z or offset), and anything else → 0."""
    assert parse_odata_timestamp("/Date(1700000000000)/") == 1700000000
    assert parse_odata_timestamp("2023-11-14T22:13:20Z") == 1700000000
    assert parse_odata_timestamp("2023-11-14T22:13:20+00:00") == 1700000000
    assert parse_odata_timestamp("not a date") == 0
    assert parse_odata_timestamp(None) == 0
    assert parse_odata_timestamp("/Date(junk)/") == 0


def test_transport_applies_query_options(odata_root):
    tr = LocalODataTransport(odata_root)
    n = tr.count("WTParts")
    assert n > 10
    page = tr.get("WTParts", top=7, skip=3, select="ID,Number")
    assert len(page) == 7 and set(page[0]) == {"ID", "Number"}
    one_ent = tr.get("WTParts", filter=f"Number eq '{page[0]['Number']}'")
    assert one_ent and all(r["Number"] == page[0]["Number"] for r in one_ent)
    with pytest.raises(ConnectionError):
        tr.get("NoSuchSet")


def test_paging_parallel_plan_covers_every_row_once(ray_session, odata_root):
    """$count known → page offsets fan out; tiny page size forces many
    pages and the union must be exactly the full set (no dup, no gap)."""
    tr = LocalODataTransport(odata_root)
    total = tr.count("WTParts")
    ds = fetch_entity_set(lambda: LocalODataTransport(odata_root),
                          "WTParts", select="ID", page_size=13)
    ids = [json.loads(r)["ID"] for r in ds.to_pandas()["record"]]
    assert len(ids) == total and len(set(ids)) == total


def test_paging_sequential_fallback_when_count_unsupported(
        ray_session, odata_root):
    """$count refused → the reference-shaped sequential loop, stopping on
    the first short page; same rows, and the throttle hook fires between
    consecutive page requests (pages-1 times)."""
    calls = {"n": 0}

    def gate():
        calls["n"] += 1

    tr = NoCountTransport(odata_root)
    total = LocalODataTransport(odata_root).count("WTParts")
    ds = fetch_entity_set(lambda: NoCountTransport(odata_root), "WTParts",
                          select="ID", page_size=13, throttle=gate)
    ids = [json.loads(r)["ID"] for r in ds.to_pandas()["record"]]
    assert len(ids) == total and len(set(ids)) == total
    n_pages = -(-total // 13)
    # short last page means the loop sees exactly n_pages requests when
    # total % 13 != 0, n_pages+1 when it divides evenly (probe page empty)
    assert calls["n"] in (n_pages - 1, n_pages)


def test_max_rows_bounds_both_paths(ray_session, odata_root):
    for cls in (LocalODataTransport, NoCountTransport):
        ds = fetch_entity_set(lambda c=cls: c(odata_root), "WTParts",
                              page_size=10, max_rows=25)
        assert ds.count() == 25


def test_unreachable_endpoint_yields_zero_rows(ray_session, tmp_path):
    """Ref :75-80 — errors are counted and swallowed, not raised."""
    ds = fetch_entity_set(lambda: LocalODataTransport(str(tmp_path)),
                          "WTParts", page_size=10)
    assert ds.count() == 0


def test_versions_via_odata_match_parquet_and_feed_temporal(
        ray_session, odata_root):
    """The typed versions Dataset pulled through the paging reader is
    row-identical to the parquet side table, and vers_latest over it
    matches the (oracle-green) parquet-fed result — transitively proving
    the S6 path against the vers_* DuckDB oracles."""
    from xlsx_to_graphdb_ray.pipelines import temporal

    via_odata = versions_from_odata(odata_root, page_size=17)
    got = via_odata.to_pandas().sort_values("full_id").reset_index(drop=True)
    want = temporal._versions("/root/testdata/sf0.001").to_pandas() \
        .sort_values("full_id").reset_index(drop=True)[got.columns]
    pd.testing.assert_frame_equal(got, want)

    key = ["entity_id", "version", "iteration"]
    a = temporal.versions_latest("/root/testdata/sf0.001",
                                 versions_ds=versions_from_odata(
                                     odata_root, page_size=17)) \
        .to_pandas().sort_values(key).reset_index(drop=True)
    b = temporal.versions_latest("/root/testdata/sf0.001") \
        .to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
