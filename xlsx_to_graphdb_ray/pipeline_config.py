"""User-extension surface (SURVEY.md §2.11).

The reference exposes pipeline-step toggles as CLI flags
(``spreadsheet_loader.py:1695-1718``: --strict-names, --resolution-report,
--dump-name-index, --add-edge-labels, --batch-size, --dry-run, …) and a
programmatic ``import_data(...)`` with injected clients. The rebuild's
equivalents:

- ``PipelineConfig`` dataclass — every toggle in one serializable object,
- a registry of named stages, each ``Dataset -> Dataset``, composable by
  name (the sink-plugin point is "write anything that takes a Dataset"),
- ``run_pipeline(cfg)`` — the programmatic entry; ``cli.py`` wraps it.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class PipelineConfig:
    sf_dir: str = "/root/testdata/sf0.001"
    out_dir: str | None = None          # None → dry run (count only)
    include_closure: bool = True        # partOfAssembly derivation (A6)
    dedup: bool = True                  # first-wins exact dedup (D1)
    strict_names: bool = False          # raise on unknown/ambiguous (J1 strict)
    resolution_report: bool = False     # J2 side output (written next to out)
    dump_dictionary: bool = False       # name-index dump (ref :1252-1259)
    add_edge_labels: bool = False       # F7 static predicate labels
    partition_by_pred: bool = True      # K1 sink layout
    ntriples_out: str | None = None     # RDF N-Triples sink dir (K1 analogue)
    extra_stages: list[str] = field(default_factory=list)


# --- named stage registry: each is Dataset -> Dataset -----------------------

def _stage_identity(ds):
    return ds


STAGE_REGISTRY: dict[str, Callable] = {
    "identity": _stage_identity,
}


def register_stage(name: str, fn: Callable) -> None:
    """Plug a custom ``Dataset -> Dataset`` stage in by name."""
    STAGE_REGISTRY[name] = fn


EDGE_LABELS = {
    "hasComponent": "has component",
    "usedIn": "used in",
    "partOfAssembly": "part of assembly",
    "hasAlternate": "has alternate",
    "describes": "describes",
}


def edge_label_triples():
    """F7 (ref :1495-1510): 5 static rdfs:label triples for predicates."""
    import pandas as pd
    import ray.data

    from .functions.normalize import ONT, RDFS_LABEL
    rows = [{"subj": ONT + p, "pred": RDFS_LABEL, "obj": lbl,
             "obj_lit": True, "prov": ""}
            for p, lbl in sorted(EDGE_LABELS.items())]
    return ray.data.from_pandas(pd.DataFrame(rows))


def run_pipeline(cfg: PipelineConfig) -> dict:
    """Programmatic entry: run the flagship pipeline under ``cfg``.

    Returns a stats manifest (counts, outputs, report paths).
    """
    from .pipelines import kg
    from .stages.resolve import strict_gate

    stats: dict = {"sf_dir": cfg.sf_dir}
    ev = kg.resolved_events(cfg.sf_dir)
    if cfg.strict_names:
        stats["resolution_counts"] = strict_gate(ev.filter(
            expr="kind == 'm'"))

    if cfg.resolution_report:
        from .pipelines.queries import kg_resolution_report
        rep_dir = os.path.join(kg.workdir(cfg.sf_dir), "resolution_report")
        kg_resolution_report(cfg.sf_dir).write_parquet(rep_dir)
        stats["resolution_report"] = rep_dir

    if cfg.dump_dictionary:
        from .stages.dictionary import build_lookup_dicts
        from . import synth
        lookups = build_lookup_dicts(synth.ensure_synth(cfg.sf_dir)["entities"])
        dump = os.path.join(kg.workdir(cfg.sf_dir), "name_index.parquet")
        import pandas as pd
        pd.DataFrame({
            "nname": list(lookups["name_to_ids"]),
            "ids": [",".join(v) for v in lookups["name_to_ids"].values()],
        }).to_parquet(dump)
        stats["name_index"] = dump

    triples = kg.build_triples(cfg.sf_dir,
                               include_closure=cfg.include_closure,
                               dedup=cfg.dedup)
    if cfg.add_edge_labels:
        triples = triples.map_batches(lambda t: t, batch_format="pyarrow") \
            .union(edge_label_triples().map_batches(
                lambda t: t, batch_format="pyarrow"))
    for name in cfg.extra_stages:
        triples = STAGE_REGISTRY[name](triples)

    if cfg.ntriples_out:
        from .sinks.ntriples import write_ntriples
        stats["ntriples_out"] = write_ntriples(triples, cfg.ntriples_out)

    if cfg.out_dir:
        if cfg.partition_by_pred:
            import pyarrow.compute as pc

            def short_pred(b):
                sp = pc.replace_substring_regex(b["pred"], r"^.*[:#]", "")
                return b.append_column("pred_short", sp)

            triples.map_batches(short_pred, batch_format="pyarrow") \
                .write_parquet(cfg.out_dir, partition_cols=["pred_short"])
        else:
            triples.write_parquet(cfg.out_dir)
        stats["out_dir"] = cfg.out_dir
        import pyarrow.parquet as pqt
        n = 0
        for root, _, files in os.walk(cfg.out_dir):
            for f in files:
                if f.endswith(".parquet"):
                    n += pqt.read_metadata(os.path.join(root, f)).num_rows
        stats["n_triples"] = n
    else:
        stats["n_triples"] = triples.count()
    return stats
