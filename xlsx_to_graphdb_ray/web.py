"""Minimal web/REST import surface (reference ``src/web/web_server.py``).

The reference's one user-facing lifecycle is ``POST /api/import``
(``web_server.py:179-327``): validate a JSON config (required input file
+ non-empty ``databases`` list), build a CLI argv per target database,
run the loader as a subprocess per database, and aggregate per-database
results into 200 (all succeeded) / 207 Multi-Status (partial) / 500
(none), with ``GET /api/health`` (:330) as the liveness probe.

The rebuild keeps the route semantics and the config vocabulary but is
**subprocess-free**: each database entry maps onto a
:class:`~xlsx_to_graphdb_ray.pipeline_config.PipelineConfig` (the argv
building at ``web_server.py:230-274`` becomes field assignment) and runs
``run_pipeline`` in-process on the already-initialised Ray session —
spawning a subprocess per request would re-pay Ray startup and double
the cluster's resource accounting. Live GraphDB/Neo4j targets don't
exist in this sandbox, so database ``type`` selects between the two
local sink families (``parquet`` → pred-partitioned Parquet, the
GraphDB-analogue K1 sink; ``ntriples`` → RDF N-Triples text parts, the
Neo4j-analogue); an unknown type is skipped exactly like the
reference's ``continue`` (:227).

Transport is split from routing the same way ``sources/changes_rpc.py``
splits it: :func:`handle_request` is a pure (method, path, body) →
(status, payload) function — unit-testable with zero sockets — and
:func:`serve` wraps it in a stdlib ``ThreadingHTTPServer`` for real use
(no Flask dependency in this container).
"""

from __future__ import annotations

import json
import os

# config keys accepted (reference names kept; web_server.py:230-274):
#   sfDir        input dir (transcript pipeline), OR
#   excelFile    raw .xlsx workbook path (reference's required field) —
#                routes through the stdlib container reader; the BOM is
#                derived from the workbook itself at import time (name
#                edges re-resolved against the fresh name index), which
#                is the reference's always-regenerate step
#                (web_server.py:196-206) without the intermediate CSVs
#   bomCsv       optional BOM CSV side input; bomByName selects the
#                name-resolved parser (--bom / --bom-by-name)
#   databases    (required) [{"type": "parquet"|"ntriples",
#                             "repository": <name>}, ...]
#   outRoot      output root; each repository becomes a subdirectory
#   strictNames  → PipelineConfig.strict_names        (--strict-names)
#   debugNames   → resolution_report + dump_dictionary
#                  (--debug-names implies --resolution-report and
#                   --dump-name-index, web_server.py:262-268)
#   addEdgeLabels→ add_edge_labels                    (--add-edge-labels)
#   dryRun       → out_dir None (count only)          (--dry-run)
#   noClosure / noDedup → include_closure / dedup toggles (CLI parity)


def _config_for(db: dict, config: dict, out_root: str):
    """One database entry → a PipelineConfig, or None to skip
    (unknown type, ref web_server.py:222-227)."""
    from .pipeline_config import PipelineConfig

    db_type = db.get("type")
    if db_type not in ("parquet", "ntriples"):
        return None
    repo = str(db.get("repository") or "imports")
    out_dir = os.path.join(out_root, repo)
    cfg = PipelineConfig(
        sf_dir=config["sfDir"],
        strict_names=bool(config.get("strictNames")),
        resolution_report=bool(config.get("debugNames")),
        dump_dictionary=bool(config.get("debugNames")),
        add_edge_labels=bool(config.get("addEdgeLabels")),
        include_closure=not config.get("noClosure"),
        dedup=not config.get("noDedup"),
    )
    if config.get("dryRun"):
        pass                      # out_dir stays None → count only
    elif db_type == "parquet":
        cfg.out_dir = out_dir
    else:
        cfg.ntriples_out = out_dir
    return cfg


def api_import(config) -> tuple[int, dict]:
    """POST /api/import body → (http_status, response payload).

    Validation, per-database execution and the 200/207/500 aggregation
    mirror ``web_server.py:180-327``; a database whose run raises
    becomes a failed result row, not a failed request.
    """
    if not isinstance(config, dict) or not config:
        return 400, {"error": "Invalid JSON data"}
    if not config.get("sfDir") and not config.get("excelFile"):
        return 400, {"error": "Input (sfDir or excelFile) is required"}
    if not config.get("databases"):
        return 400, {"error": "At least one target database is required"}
    if config.get("excelFile"):
        if not os.path.exists(config["excelFile"]):
            return 404, {"error":
                         f"Excel file not found: {config['excelFile']}"}
        return _import_workbook(config)
    if not os.path.isdir(config["sfDir"]):
        return 404, {"error": f"Input dir not found: {config['sfDir']}"}

    from .pipeline_config import run_pipeline

    out_root = config.get("outRoot") or "/tmp/graft_web_out"
    results = []
    for db in config["databases"]:
        cfg = _config_for(db, config, out_root)
        if cfg is None:
            continue
        info = {"database": db.get("type"),
                "repository": str(db.get("repository") or "imports")}
        try:
            stats = run_pipeline(cfg)
            info.update(success=True, stats=stats)
        except Exception as e:          # per-db failure → result row
            info.update(success=False, error=f"{type(e).__name__}: {e}")
        results.append(info)

    if not results:
        return 400, {"error": "No supported database targets in request"}
    n_ok = sum(r["success"] for r in results)
    if n_ok == len(results):
        verb = "Dry run" if config.get("dryRun") else "Import"
        return 200, {"success": True, "results": results,
                     "message": f"{verb} completed successfully to "
                                f"{len(results)} database(s)!"}
    if n_ok:
        return 207, {"success": False, "results": results,
                     "message": f"Partial success: {n_ok}/{len(results)} "
                                f"database(s) imported"}
    return 500, {"success": False, "results": results,
                 "error": f"Import failed to all {len(results)} "
                          f"database(s)"}


def _import_workbook(config: dict) -> tuple[int, dict]:
    """The reference's primary import shape: raw workbook in, one import
    run per target database (web_server.py:216-291). The triples Dataset
    is built ONCE and written per database — the reference re-runs the
    whole loader subprocess per target, pure duplicated work in-process."""
    import pandas as pd

    from .sources.xlsx import import_xlsx

    bom = None
    if config.get("bomCsv"):
        try:
            bom = pd.read_csv(config["bomCsv"])
        except OSError as e:
            return 500, {"error": f"BOM file not readable: {e}"}
    try:
        triples, stats = import_xlsx(
            config["excelFile"], bom,
            bom_by_name=bool(config.get("bomByName")),
            strict_names=bool(config.get("strictNames")))
    except Exception as e:
        return 500, {"error": f"Import failed: {type(e).__name__}: {e}"}

    out_root = config.get("outRoot") or "/tmp/graft_web_out"
    results = []
    for db in config["databases"]:
        db_type = db.get("type")
        if db_type not in ("parquet", "ntriples"):
            continue
        repo = str(db.get("repository") or "imports")
        info = {"database": db_type, "repository": repo}
        out_dir = os.path.join(out_root, repo)
        try:
            if config.get("dryRun"):
                info.update(success=True,
                            stats={**stats, "n_triples": triples.count()})
            elif db_type == "parquet":
                triples.write_parquet(out_dir)
                info.update(success=True, stats={**stats, "out_dir": out_dir})
            else:
                from .sinks.ntriples import write_ntriples
                write_ntriples(triples, out_dir)
                info.update(success=True,
                            stats={**stats, "ntriples_out": out_dir})
        except Exception as e:
            info.update(success=False, error=f"{type(e).__name__}: {e}")
        results.append(info)
    if not results:
        return 400, {"error": "No supported database targets in request"}
    n_ok = sum(r["success"] for r in results)
    status = 200 if n_ok == len(results) else 207 if n_ok else 500
    return status, {"success": n_ok == len(results), "results": results}


def api_inputs() -> tuple[int, dict]:
    """GET /api/inputs — discoverable input dirs (the ``/api/excel-files``
    listing, web_server.py:53-66, re-homed to sf dirs)."""
    root = os.environ.get("GRAFT_DATA_ROOT", "/root/testdata")
    try:
        dirs = sorted(d for d in os.listdir(root)
                      if os.path.isdir(os.path.join(root, d)))
    except OSError:
        dirs = []                 # ref: listing errors → empty array
    return 200, {"root": root, "inputs": dirs}


def handle_request(method: str, path: str, body=None) -> tuple[int, dict]:
    """Route one request. ``body`` is bytes/str (JSON) or an already-
    parsed dict; anything unparseable is a 400 like the reference."""
    if path == "/api/health" and method == "GET":
        return 200, {"status": "healthy"}
    if path == "/api/inputs" and method == "GET":
        return api_inputs()
    if path == "/api/import" and method == "POST":
        if isinstance(body, (bytes, str)):
            try:
                body = json.loads(body or "null")
            except json.JSONDecodeError:
                return 400, {"error": "Invalid JSON data"}
        return api_import(body)
    return 404, {"error": f"No route {method} {path}"}


def serve(host: str = "127.0.0.1", port: int = 7340):
    """Blocking stdlib HTTP wrapper around :func:`handle_request`.
    The caller owns the Ray session (same contract as cli.py)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _answer(self, method):
            n = int(self.headers.get("Content-Length") or 0)
            status, payload = handle_request(
                method, self.path, self.rfile.read(n) if n else None)
            data = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            self._answer("GET")

        def do_POST(self):
            self._answer("POST")

        def log_message(self, *a):   # quiet; the JSON answers are the log
            pass

    srv = ThreadingHTTPServer((host, port), Handler)
    try:
        srv.serve_forever()
    finally:
        srv.server_close()


if __name__ == "__main__":
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    serve()
