#!/usr/bin/env python
"""Benchmark harness: headline KG pipeline over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "kg_triples_e2e", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <float>, "num_cpus": N,
   "triples": T, "turns": U, "triples_per_sec": ..., "turns_per_sec": ...}

``--scaling`` runs the same job in two fresh processes at N vs 4N CPUs
(default N=2 vs 8, override via GRAFT_SCALING_CPUS_LO) on the same larger
synthetic input (default /tmp/graft_scale/sf2, ~12M turns) and reports both
plus scaling efficiency (cluster-free evidence protocol per BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray
    if not ray.is_initialized():
        # log_to_driver=False: worker-process log lines (schema-hash
        # warnings etc.) otherwise interleave with stdout and can push the
        # result JSON out of the harness's tail window (BENCH_r04 was
        # unparseable for exactly this reason)
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR",
                 log_to_driver=False)
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from xlsx_to_graphdb_ray import synth
    from xlsx_to_graphdb_ray.pipelines import kg
    from xlsx_to_graphdb_ray.pipelines import queries as q

    # untimed: materialize synthetic input + warm the page cache
    paths = synth.ensure_synth(sf_dir)
    import pyarrow.parquet as pq
    turns_rows = pq.read_metadata(paths["turns"]).num_rows
    pq.read_table(paths["turns"])  # warm read

    # untimed warm-up: run the full pipeline at sf0.001 so Ray worker
    # processes, actor pools and imports are up before the timed run
    # (measures pipeline compute + shuffle, not session cold-start)
    warm_sf = "/root/testdata/sf0.001"
    if os.path.exists(kg.workdir(warm_sf)):
        shutil.rmtree(kg.workdir(warm_sf))
    kg.triples_dataset(warm_sf).count()

    # cold pipeline: wipe checkpoints so the timed run does the full work
    wd = kg.workdir(sf_dir)
    if os.path.exists(wd):
        shutil.rmtree(wd)

    t0 = time.perf_counter()
    triples = kg.triples_dataset(sf_dir)
    n_triples = triples.count()
    t_pipeline = time.perf_counter() - t0

    timings: dict[str, float] = {}

    def timed(name, fn):
        t = time.perf_counter()
        res = fn(sf_dir)
        if hasattr(res, "count"):
            res.count()
        timings[name] = round(time.perf_counter() - t, 3)

    if os.environ.get("GRAFT_FLAGSHIP_ONLY") == "1":
        # scaling-protocol legs: the efficiency metric is the flagship
        # pipeline time only — skip the per-query sweep (it's fixed-size
        # side-table work that would just stretch the wall clock)
        out = {
            "metric": "kg_triples_e2e",
            "value": round(t_pipeline, 3),
            "unit": "sec",
            "queries": {"kg_triples_cold": round(t_pipeline, 3)},
            "sf": synth.sf_from_dir(sf_dir),
            "num_cpus": num_cpus,
            "triples": int(n_triples),
            "turns": int(turns_rows),
            "triples_per_sec": round(n_triples / t_pipeline, 1),
            "turns_per_sec": round(turns_rows / t_pipeline, 1),
        }
        ray.shutdown()
        return out

    # warm queries (reuse the stage checkpoints, like a resumed run)
    timed("kg_pred_counts", q.kg_pred_counts)
    timed("kg_closure", q.kg_closure)
    timed("kg_topic_turns", q.kg_topic_turns)
    timed("kg_tool_usage", q.kg_tool_usage)
    timed("kg_resolution_status", q.kg_resolution_status)
    timed("kg_fuzzy_candidates", q.kg_fuzzy_candidates)
    timed("kg_first_mention", q.kg_first_mention)
    timed("kg_twin_pairs", q.kg_twin_pairs)
    timed("kg_prefix_pairs", q.kg_prefix_pairs)
    timed("kg_depth_topk", q.kg_depth_topk)
    timed("kg_resolution_report", q.kg_resolution_report)

    # training-data operators at the same tier
    from xlsx_to_graphdb_ray.pipelines import changes as ch
    from xlsx_to_graphdb_ray.pipelines import relational as r
    from xlsx_to_graphdb_ray.pipelines import temporal as tp
    from xlsx_to_graphdb_ray.pipelines import training as tr
    timed("docs_exact_dedup", tr.docs_exact_dedup)
    timed("docs_minhash_pairs", tr.docs_minhash_pairs)
    timed("docs_ngram_pairs", tr.docs_ngram_pairs)
    timed("docs_token_stats", tr.docs_token_stats)
    timed("docs_simhash", tr.docs_simhash)
    timed("docs_simhash_pairs", tr.docs_simhash_pairs)
    timed("docs_dup_clusters", tr.docs_dup_clusters)
    timed("docs_quality", tr.docs_quality)
    timed("docs_lang_id", tr.docs_lang_id)
    timed("docs_fingerprint", tr.docs_fingerprint)
    timed("docs_tfidf_topk", tr.docs_tfidf_topk)
    timed("docs_chunk_seqs", tr.docs_chunk_seqs)
    timed("docs_top_bigrams", tr.docs_top_bigrams)
    timed("docs_split", tr.docs_split)
    timed("docs_sample", tr.docs_sample)
    timed("docs_stratified_sample", tr.docs_stratified_sample)
    timed("docs_decontaminate", tr.docs_decontaminate)
    timed("docs_mix_report", tr.docs_mix_report)
    timed("docs_train_mix", tr.docs_train_mix)
    timed("docs_repetition", tr.docs_repetition)
    timed("docs_pii_scrub", tr.docs_pii_scrub)
    timed("docs_dedup_corpus", tr.docs_dedup_corpus)
    timed("docs_lm_score", tr.docs_lm_score)
    timed("docs_shuffle_shards", tr.docs_shuffle_shards)
    timed("docs_pack_bins", tr.docs_pack_bins)
    timed("ann_topk", tr.ann_topk)
    timed("ann_ivf_topk", tr.ann_ivf_topk)
    timed("vecs_centroid_assign", tr.vecs_centroid_assign)
    timed("vecs_kmeans_step", tr.vecs_kmeans_step)
    timed("vecs_kmeans_train", tr.vecs_kmeans_train)
    timed("vecs_near_dup_exact", tr.vecs_near_dup_exact)
    timed("vecs_near_dup_lsh", tr.vecs_near_dup_lsh)
    timed("vecs_dup_clusters", tr.vecs_dup_clusters)
    timed("vecs_dedup_corpus", tr.vecs_dedup_corpus)
    timed("vecs_dup_clusters_lsh", tr.vecs_dup_clusters_lsh)
    timed("vecs_dedup_corpus_lsh", tr.vecs_dedup_corpus_lsh)
    timed("events_sessionize", tr.events_sessionize)
    timed("events_tumbling", tr.events_tumbling)
    timed("events_next_purchase", tr.events_next_purchase)
    timed("events_type_transitions", tr.events_type_transitions)
    timed("events_props_sum", tr.events_props_sum)
    timed("events_hopping", tr.events_hopping)
    timed("events_value_quantiles", tr.events_value_quantiles)
    timed("events_quantiles_sketch", tr.events_quantiles_sketch)
    timed("vers_latest", tp.versions_latest)
    timed("vers_evolves_to", tp.versions_evolves_to)
    timed("changes_by_type", ch.changes_by_type)
    timed("changes_affects_links", ch.changes_affects_links)
    timed("changes_depends_on", ch.changes_depends_on)
    timed("mm_byte_stats", tr.mm_byte_stats)
    timed("mm_entropy", tr.mm_entropy)
    timed("mm_header_meta", tr.mm_header_meta)
    timed("mm_decoded_means", tr.mm_decoded_means)
    timed("rel_pricing_summary", r.pricing_summary)
    timed("rel_brand_revenue", r.brand_revenue)
    timed("rel_top_parts", r.top_parts_by_usage)
    timed("rel_parts_having", r.parts_usage_having)
    timed("rel_top_customers", r.customer_order_totals_topk)
    timed("rel_distinct_nations", r.distinct_active_nations)
    timed("rel_region_order_stats", r.region_order_stats)

    from xlsx_to_graphdb_ray.stages import ann, closure, dedup_docs
    out = {
        "metric": "kg_triples_e2e",
        "value": round(t_pipeline, 3),
        "unit": "sec",
        "queries": {"kg_triples_cold": round(t_pipeline, 3), **timings},
        "sf": synth.sf_from_dir(sf_dir),
        "num_cpus": num_cpus,
        "triples": int(n_triples),
        "turns": int(turns_rows),
        "triples_per_sec": round(n_triples / t_pipeline, 1),
        "turns_per_sec": round(turns_rows / t_pipeline, 1),
        # which dispatch tier the minhash candidate stage took this run
        # (tier flips change the wall time materially — make them visible)
        "docs_minhash_pairs_tier": dedup_docs.LAST_MINHASH_TIER,
        "vecs_near_dup_tier": ann.LAST_VEC_TIER,
        "closure_tier": closure.LAST_CLOSURE_TIER,
    }
    ray.shutdown()
    return out


SHARED_TABLES = ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"]


def _ensure_scale_dir(scale_dir: str,
                      template: str = "/root/testdata/sf0.1") -> None:
    """The scaling tier's synthetic inputs (turns/entities/side corpora)
    are generated on demand, but the driver-shared tables only exist at
    the testdata tiers — symlink them in so the warm side queries run.
    (The scaling METRIC is the flagship turns pipeline at the scale tier;
    the side queries are fixed-size either way.)"""
    os.makedirs(scale_dir, exist_ok=True)
    for t in SHARED_TABLES:
        dst = os.path.join(scale_dir, f"{t}.parquet")
        src = os.path.join(template, f"{t}.parquet")
        if not os.path.exists(dst) and os.path.exists(src):
            os.symlink(src, dst)


def run_scaling() -> dict:
    """Same job, fresh processes, N vs 4N CPUs (default 2 vs 8) → efficiency.

    Runs on a larger synthetic tier (default /tmp/graft_scale/sf2, ~12M
    turns) than the throughput bench: at sf0.1 the whole pipeline finishes
    in ~15 s and is execution-latency-bound, which measures Ray's fixed
    orchestration cost, not how the job scales. Identical input for both
    parallelism levels; low CPU counts keep the machine unsaturated so the
    4N leg isn't throttled by the sandbox's real core budget.
    """
    scale_dir = os.environ.get("GRAFT_SCALING_SF_DIR", "/tmp/graft_scale/sf2")
    _ensure_scale_dir(scale_dir)
    lo = int(os.environ.get("GRAFT_SCALING_CPUS_LO", "2"))
    hi = lo * 4  # the N vs 4N protocol
    results = {}
    # hi leg FIRST: it is ~4x more sensitive to neighbor-steal on this
    # shared host (it needs 4x the cores), so it gets the freshest part
    # of the idle window; leg order does not change the efficiency math.
    # Validity gate (documented in BASELINE.md): accept a run only if
    # BOTH legs' absolute walls match idle-host records within ~8% —
    # a stolen lo leg would inflate the ratio, not just deflate it.
    for ncpu in (hi, lo):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_SF_DIR=scale_dir, GRAFT_FLAGSHIP_ONLY="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__))).stdout
        results[ncpu] = json.loads(out.strip().splitlines()[-1])
    t_lo, t_hi = results[lo]["value"], results[hi]["value"]
    return {
        "metric": "scaling_efficiency",
        "cpus_lo": lo,
        "cpus_hi": hi,
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        f"throughput_{lo}_triples_per_sec": results[lo]["triples_per_sec"],
        f"throughput_{hi}_triples_per_sec": results[hi]["triples_per_sec"],
        "speedup": round(t_lo / t_hi, 3),
        "scaling_efficiency": round((t_lo / t_hi) / (hi / lo), 3),
        "sf": results[hi]["sf"],
    }


RESULT_COPY = "/tmp/graft_bench_latest.json"


def _emit(result: dict) -> None:
    """The result JSON must be the very LAST line of output: flush any
    buffered log noise first, keep a file copy (harness tail windows have
    truncated a result line before — BENCH_r04), then print."""
    line = json.dumps(result)
    try:
        with open(RESULT_COPY, "w") as f:
            f.write(line + "\n")
    except OSError:
        pass
    sys.stderr.flush()
    print(line, flush=True)


if __name__ == "__main__":
    _emit(run_scaling() if "--scaling" in sys.argv else run_bench())
