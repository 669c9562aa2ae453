"""CLI for the flagship pipeline — the reference's flag surface, re-homed.

Maps the reference's CLI (``spreadsheet_loader.py:1695-1718``) onto the
transcript pipeline:

    python -m xlsx_to_graphdb_ray.cli --sf-dir /root/testdata/sf0.001 \
        --out /tmp/triples --strict-names --resolution-report

The CLI owns the Ray session (guarded init); library code never does.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None,
                    help="output dir for triples parquet (omit = dry run)")
    ap.add_argument("--num-cpus", type=int, default=8)
    ap.add_argument("--strict-names", action="store_true")
    ap.add_argument("--resolution-report", action="store_true")
    ap.add_argument("--dump-name-index", action="store_true")
    ap.add_argument("--add-edge-labels", action="store_true")
    ap.add_argument("--no-closure", action="store_true")
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument("--flat-partitions", action="store_true",
                    help="single dir instead of pred-partitioned layout")
    ap.add_argument("--load-script", default=None, metavar="PATH",
                    help="with --ntriples-out: also generate a resumable "
                         "shell loader (K6) that POSTs the .nt parts to a "
                         "SPARQL endpoint")
    ap.add_argument("--endpoint", default="http://127.0.0.1:7200",
                    help="SPARQL endpoint base URL for --load-script")
    ap.add_argument("--repository", default="imports",
                    help="repository name for --load-script")
    ap.add_argument("--batch-size", type=int, default=1000,
                    help="triples per POST for --load-script (max 10000, "
                         "ref spreadsheet_loader.py:1703)")
    ap.add_argument("--ntriples-out", default=None,
                    help="also emit RDF N-Triples part files to this dir")
    ap.add_argument("--xlsx", default=None,
                    help="import a raw .xlsx workbook (container byte path) "
                         "instead of the transcript pipeline")
    ap.add_argument("--bom-csv", default=None,
                    help="with --xlsx: parent/child BOM CSV side input")
    ap.add_argument("--bom-by-name", action="store_true",
                    help="with --xlsx: resolve BOM rows by part NAME")
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from .config import tune_context
    tune_context()

    if args.xlsx:
        # reference entry import_data(excel_path, bom_csv_path, ...) —
        # spreadsheet_loader.py:1355-1369 — over the stdlib container reader
        import pandas as pd
        from .sources.xlsx import import_xlsx
        bom = pd.read_csv(args.bom_csv) if args.bom_csv else None
        ds, stats = import_xlsx(args.xlsx, bom,
                                bom_by_name=args.bom_by_name,
                                strict_names=args.strict_names)
        if args.out:
            ds.write_parquet(args.out)
        if args.ntriples_out:
            from .sinks.ntriples import write_ntriples
            write_ntriples(ds, args.ntriples_out)
            if args.load_script:
                from .sinks.load_script import generate_load_script
                generate_load_script(
                    args.ntriples_out, args.endpoint, args.repository,
                    batch_triples=args.batch_size,
                    out_path=args.load_script)
        print(json.dumps(stats, default=str))
        ray.shutdown()
        return 0
    from .pipeline_config import PipelineConfig, run_pipeline

    cfg = PipelineConfig(
        sf_dir=args.sf_dir,
        out_dir=args.out,
        include_closure=not args.no_closure,
        dedup=not args.no_dedup,
        strict_names=args.strict_names,
        resolution_report=args.resolution_report,
        dump_dictionary=args.dump_name_index,
        add_edge_labels=args.add_edge_labels,
        partition_by_pred=not args.flat_partitions,
        ntriples_out=args.ntriples_out,
    )
    stats = run_pipeline(cfg)
    if args.load_script:
        if not args.ntriples_out:
            ap.error("--load-script requires --ntriples-out")
        from .sinks.load_script import generate_load_script
        stats["load_script"] = args.load_script
        generate_load_script(
            args.ntriples_out, args.endpoint, args.repository,
            batch_triples=args.batch_size, out_path=args.load_script)
    print(json.dumps(stats, default=str))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
