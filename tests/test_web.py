"""Web/REST import surface — route semantics of ref web_server.py:179-331."""

import json
import os
import threading
import urllib.request

import pyarrow.parquet as pq
import pytest

from xlsx_to_graphdb_ray.web import api_import, handle_request

SF = "/root/testdata/sf0.001"


def test_health_routing_and_bad_json():
    assert handle_request("GET", "/api/health") == (200, {"status": "healthy"})
    assert handle_request("GET", "/nope")[0] == 404
    assert handle_request("POST", "/api/health")[0] == 404
    assert handle_request("POST", "/api/import", b"{not json")[0] == 400


def test_inputs_listing_lists_sf_dirs():
    status, payload = handle_request("GET", "/api/inputs")
    assert status == 200 and "sf0.001" in payload["inputs"]


def test_import_validation_mirrors_reference():
    """web_server.py:185-191 — missing pieces are 400s, bad path 404."""
    assert api_import(None)[0] == 400
    assert api_import({"databases": [{"type": "parquet"}]})[0] == 400
    assert api_import({"sfDir": SF})[0] == 400
    assert api_import({"sfDir": "/no/such/dir",
                       "databases": [{"type": "parquet"}]})[0] == 404
    # only unsupported types → skipped like the reference's `continue`
    status, payload = api_import(
        {"sfDir": SF, "databases": [{"type": "oracle", "repository": "x"}]})
    assert status == 400 and "No supported" in payload["error"]


def test_import_both_sinks_end_to_end(ray_session, tmp_path):
    """One POST, two databases → 200, both sinks written, manifests agree
    (the subprocess-per-database loop of web_server.py:216-292, in-process)."""
    status, payload = handle_request("POST", "/api/import", json.dumps({
        "sfDir": SF,
        "outRoot": str(tmp_path),
        "databases": [{"type": "parquet", "repository": "kb"},
                      {"type": "ntriples", "repository": "nt"}],
    }))
    assert status == 200 and payload["success"]
    assert [r["success"] for r in payload["results"]] == [True, True]
    stats = {r["database"]: r["stats"] for r in payload["results"]}

    # parquet sink: pred-partitioned layout, counted manifest
    n_pq = stats["parquet"]["n_triples"]
    part_dirs = [d for d in os.listdir(tmp_path / "kb")
                 if d.startswith("pred_short=")]
    assert n_pq > 0 and len(part_dirs) > 10
    on_disk = sum(pq.read_metadata(os.path.join(root, f)).num_rows
                  for root, _, fs in os.walk(tmp_path / "kb")
                  for f in fs if f.endswith(".parquet"))
    assert on_disk == n_pq

    # ntriples sink: same triple count through the text sink
    n_lines = sum(1 for f in os.listdir(tmp_path / "nt")
                  if f.endswith(".nt")
                  for _ in open(tmp_path / "nt" / f, encoding="utf-8"))
    assert n_lines == stats["ntriples"]["n_triples"] == n_pq


def test_import_dry_run_and_debug_names(ray_session, tmp_path):
    """dryRun → counts only, nothing written; debugNames implies the
    resolution-report + name-index side outputs (web_server.py:262-268)."""
    status, payload = api_import({
        "sfDir": SF, "outRoot": str(tmp_path), "dryRun": True,
        "debugNames": True,
        "databases": [{"type": "parquet", "repository": "dry"}]})
    assert status == 200 and "Dry run" in payload["message"]
    stats = payload["results"][0]["stats"]
    assert stats["n_triples"] > 0 and not (tmp_path / "dry").exists()
    assert os.path.isdir(stats["resolution_report"])
    assert os.path.exists(stats["name_index"])


def test_import_partial_failure_is_207(ray_session, tmp_path):
    """One sink lands, one raises → 207 Multi-Status with per-db rows
    (web_server.py:306-315)."""
    (tmp_path / "broken").write_text("a file where the sink needs a dir")
    status, payload = api_import({
        "sfDir": SF, "outRoot": str(tmp_path),
        "databases": [{"type": "parquet", "repository": "ok"},
                      {"type": "ntriples",
                       "repository": "broken/nested"}]})
    assert status == 207 and not payload["success"]
    by_db = {r["database"]: r for r in payload["results"]}
    assert by_db["parquet"]["success"]
    assert not by_db["ntriples"]["success"] and by_db["ntriples"]["error"]


def test_import_workbook_route(ray_session, tmp_path):
    """The reference's primary shape — excelFile in, per-db import out
    (web_server.py:193-291); BOM edges re-derived at import time = the
    always-regenerate step without intermediate CSVs."""
    import pandas as pd
    from xlsx_to_graphdb_ray.sources import xlsx

    wb = str(tmp_path / "parts.xlsx")
    xlsx.write_xlsx(wb, {"Sheet1": pd.DataFrame(
        [["Number", "Name"], [111, "Frame"], [222, "Ski"]])}, header=False)
    bom = str(tmp_path / "bom.csv")
    pd.DataFrame({"Parent Name": ["Frame"],
                  "Child Name": ["Ski"]}).to_csv(bom, index=False)

    status, payload = api_import({
        "excelFile": wb, "bomCsv": bom, "bomByName": True,
        "outRoot": str(tmp_path / "out"),
        "databases": [{"type": "parquet", "repository": "wb"}]})
    assert status == 200, payload
    stats = payload["results"][0]["stats"]
    assert stats["n_triples"] == 7          # 2 parts x 3 + 1 name-BOM edge
    got = pd.read_parquet(tmp_path / "out" / "wb")
    edge = got[got["pred"].str.endswith("hasComponent")]
    assert edge["subj"].tolist() == ["urn:part:111"]
    assert edge["obj"].tolist() == ["urn:part:222"]

    assert api_import({"excelFile": "/no/such.xlsx",
                       "databases": [{"type": "parquet"}]})[0] == 404


def test_stdlib_server_answers_on_loopback(ray_session):
    """serve() wrapper: real socket round-trip for the liveness route."""
    from http.server import ThreadingHTTPServer
    from xlsx_to_graphdb_ray import web

    # bind port 0 (ephemeral) through the same handler class serve() uses
    captured = {}
    orig = ThreadingHTTPServer.serve_forever

    def grab(self, *a, **k):
        captured["srv"] = self
        orig(self)

    ThreadingHTTPServer.serve_forever = grab
    t = threading.Thread(target=web.serve, args=("127.0.0.1", 0), daemon=True)
    t.start()
    for _ in range(100):
        if "srv" in captured:
            break
        t.join(0.05)
    ThreadingHTTPServer.serve_forever = orig
    if "srv" not in captured:          # sandbox without loopback sockets
        pytest.skip("loopback bind unavailable")
    port = captured["srv"].server_address[1]
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/health", timeout=5) as r:
            assert r.status == 200
            assert json.load(r) == {"status": "healthy"}
    finally:
        captured["srv"].shutdown()
