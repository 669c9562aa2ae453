"""Driver-contract query implementations (Ray side).

Each function takes ``sf_dir`` and returns a Dataset / DataFrame whose
column names match the corresponding DuckDB oracle in
``pipelines.oracles`` exactly (the driver's comparator hashes values under
sorted column names).
"""

from __future__ import annotations

import pandas as pd
import ray.data

from .. import synth
from ..stages.canonicalize import canonical_mapper
from ..stages.closure import transitive_closure
from ..stages.extract import topic_turns
from ..stages.shuffle import grouped_agg, grouped_distinct
from . import kg


def _mention_events(sf_dir: str):
    return kg.resolved_events(sf_dir).filter(expr="kind == 'm'")


def kg_mentions(sf_dir: str):
    """Post-anaphora mention stream: (conv_id, turn_idx, ord, alias)."""
    ev = _mention_events(sf_dir)
    return ev.map_batches(
        lambda b: pd.DataFrame({
            "conv_id": b["conv_id"], "turn_idx": b["turn_idx"],
            "ord": b["ord"], "alias": b["a"]}),
        batch_format="pandas")


def kg_resolution_status(sf_dir: str):
    """Mention resolution outcome counts: (status, n) — A8 analogue."""
    ev = _mention_events(sf_dir)
    out = grouped_agg(ev, ["a_status"], [("n", None, "count")],
                      small_result=True)
    return out.map_batches(
        lambda b: pd.DataFrame({"status": b["a_status"], "n": b["n"]}),
        batch_format="pandas")


def kg_sameas_canon(sf_dir: str):
    """Canonicalization delta map: (entity_id, canon_id)."""
    return kg.canonical_delta(sf_dir)


def kg_first_mention(sf_dir: str):
    """First-wins provenance per canonical entity: (canon_id, prov) — D1."""
    return kg.first_mentions(sf_dir)


def _canonical_component_edges(sf_dir: str):
    delta = kg.canonical_delta(sf_dir)
    canon = canonical_mapper(delta)
    ev = kg.resolved_events(sf_dir).filter(
        expr="kind == 'r' and pred == 'hasComponent' and "
             "a_status == 'resolved' and b_status == 'resolved'")
    return ev.map_batches(
        lambda b: pd.DataFrame({"parent": canon(b["a_id"]),
                                "child": canon(b["b_id"])}),
        batch_format="pandas")


def kg_closure(sf_dir: str):
    """Transitive closure pairs over canonical hasComponent edges — A6."""
    return transitive_closure(_canonical_component_edges(sf_dir))


def kg_triples(sf_dir: str):
    """The headline: the full deduplicated (subj, pred, obj) triple set."""
    return kg.triples_dataset(sf_dir).select_columns(["subj", "pred", "obj"])


def kg_pred_counts(sf_dir: str):
    """Triple mix by predicate: (pred, n) — A1 statistics analogue."""
    return grouped_agg(kg.triples_dataset(sf_dir), ["pred"],
                       [("n", None, "count")], small_result=True)


def kg_topic_turns(sf_dir: str):
    """Keyword-predicate filter counts (M5 analogue): (topic, n)."""
    paths = synth.ensure_synth(sf_dir)
    from ..state.checkpoint import read_parquet_auto
    turns = read_parquet_auto(paths["turns"],
                              columns=["conv_id", "turn_idx", "text"])
    hits = turns.map_batches(
        lambda b: topic_turns(b, synth.TOPICS), batch_format="pyarrow")
    return grouped_agg(hits, ["topic"], [("n", None, "count")],
                       small_result=True)


def kg_twin_pairs(sf_dir: str):
    """J5 SUPERSEDES self-join (ref snowmobile_neo4j_importer.py:250-264):
    entities with equal name, different id, ordered id< → (id_lo, id_hi,
    name)."""
    from ..stages.shuffle import bucketed_map_groups

    paths = synth.ensure_synth(sf_dir)
    from ..state.checkpoint import read_parquet_auto
    ents = read_parquet_auto(paths["entities"], columns=["entity_id", "name"])

    from ..stages.dedup_docs import MAX_GROUP_MEMBERS
    from ..stages.joins import group_pairs

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized triu pair emission with the per-group fan-out guard
        # (an adversarial hot name would otherwise emit O(group²) pairs
        # from one bucket; cap is far above observed group sizes)
        p = group_pairs(g, "name", "entity_id", MAX_GROUP_MEMBERS)
        return p[["id_lo", "id_hi", "name"]]

    return bucketed_map_groups(ents, ["name"], pairs, n_buckets=16)


def kg_depth_topk(sf_dir: str, max_hops: int = 4, k: int = 5):
    """A4 deepest-chain verification query (ref
    verify_snowmobile_graph.py:145-160, :224-236): per ancestor, the longest
    hasComponent path within ≤``max_hops``; top-``k`` by (depth desc, anc).

    Auto-dispatch like ``transitive_closure``: below ``closure.DRIVER_LIMIT``
    edges the (derived, small) edge list is pulled once and BFS'd with
    vectorized pandas; past it, a distributed bounded-hop BFS (hash joins +
    grouped max) runs without any full driver collect.
    """
    from ..stages import closure

    edges_ds = _canonical_component_edges(sf_dir) \
        .select_columns(["parent", "child"])
    try:
        edges = edges_ds.to_pandas(limit=closure.DRIVER_LIMIT) \
            .drop_duplicates()
    except ValueError:
        edges = None

    if edges is not None:
        # bounded-hop BFS with depth tracking (driver: derived edge list)
        # longest-walk-within-max_hops: distinct (anc, node) per hop count
        # (matches the recursive-CTE oracle's UNION-distinct semantics)
        frontier = edges.rename(columns={"parent": "anc", "child": "node"}) \
            .drop_duplicates()
        frontier["depth"] = 1
        best = frontier[["anc", "depth"]]
        for d in range(2, max_hops + 1):
            step = frontier.merge(edges, left_on="node", right_on="parent")
            step = step[["anc", "child"]].rename(columns={"child": "node"}) \
                .drop_duplicates()
            step["depth"] = d
            if step.empty:
                break
            best = pd.concat([best, step[["anc", "depth"]]],
                             ignore_index=True)
            frontier = step
        out = best.groupby("anc", as_index=False)["depth"].max() \
            .sort_values(["depth", "anc"], ascending=[False, True]).head(k) \
            .reset_index(drop=True)
        return ray.data.from_pandas(out)

    # distributed bounded-hop BFS: per hop, frontier ⋈ edges (bucketed hash
    # join) → distinct; per-anc max depth via pre-combined grouped agg; only
    # the k-row result reaches the driver
    from ..stages.joins import hash_join
    from ..stages.shuffle import grouped_agg, grouped_distinct

    base = grouped_distinct(edges_ds, ["parent", "child"]).materialize()
    frontier = base.map_batches(
        lambda b: pd.DataFrame({"anc": b["parent"], "node": b["child"]})
        .drop_duplicates(), batch_format="pandas").materialize()
    depth_parts = [frontier.map_batches(
        lambda b: pd.DataFrame({"anc": b["anc"], "depth": 1}),
        batch_format="pandas")]
    for d in range(2, max_hops + 1):
        step = hash_join(frontier, base, on=["node"], right_on=["parent"]
                         ).map_batches(
            lambda b: pd.DataFrame({"anc": b["anc"], "node": b["child"]}),
            batch_format="pandas")
        step = grouped_distinct(step, ["anc", "node"]).materialize()
        if step.count() == 0:
            break
        depth_parts.append(step.map_batches(
            lambda b, d=d: pd.DataFrame({"anc": b["anc"], "depth": d}),
            batch_format="pandas"))
        frontier = step
    all_depths = depth_parts[0]
    for p in depth_parts[1:]:
        all_depths = all_depths.union(p)
    per_anc = grouped_agg(all_depths, ["anc"],
                          [("depth", "depth", "max")], n_buckets=16)
    out = per_anc.sort(["depth", "anc"], descending=[True, False]).limit(k) \
        .to_pandas().reset_index(drop=True)
    out["depth"] = out["depth"].astype("int64")
    return ray.data.from_pandas(out)


def kg_prefix_pairs(sf_dir: str):
    """J6 prefix-blocking self-join + J10 anti-join (ref
    snowmobile_neo4j_importer.py:267-282, ingest_changes.py:191-200):
    entities sharing the 2-token name prefix (blocking key), id-ordered,
    minus pairs already connected by a canonical hasComponent edge."""
    from ..stages.joins import hash_join
    from ..stages.shuffle import bucketed_map_groups

    paths = synth.ensure_synth(sf_dir)
    from ..state.checkpoint import read_parquet_auto
    ents = read_parquet_auto(paths["entities"], columns=["entity_id", "name"])

    def blocks(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["name"].str.split(" ")
        ok = toks.str.len() >= 3
        blk = toks[ok].map(lambda t: t[0] + " " + t[1])
        return pd.DataFrame({"entity_id": b["entity_id"][ok], "blk": blk})

    from ..stages.dedup_docs import MAX_GROUP_MEMBERS
    from ..stages.joins import group_pairs

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized pair emission, bounded fan-out per prefix block
        # (see kg_twin_pairs note)
        return group_pairs(g, "blk", "entity_id",
                           MAX_GROUP_MEMBERS)[["id_lo", "id_hi"]]

    cand = bucketed_map_groups(
        ents.map_batches(blocks, batch_format="pandas"), ["blk"], pairs,
        n_buckets=16)
    comp = _canonical_component_edges(sf_dir)

    # the anti side is the DISTINCT canonical hasComponent edge vocabulary —
    # entity-bounded, so broadcast it (both orientations in one string
    # Index, probed once per batch: zero exchanges) instead of shuffling
    # the O(pairs) candidate set through two chained anti-joins.
    # Per-block distinct BEFORE the guarded collect (nothing
    # input-proportional crosses to the driver); past the limit, fall back
    # to the distributed hash anti-joins.
    from ..stages import closure

    try:
        edges = comp.map_batches(
            lambda b: b.drop_duplicates(), batch_format="pandas") \
            .to_pandas(limit=closure.DRIVER_LIMIT).drop_duplicates()
    except ValueError:
        edges = None
    if edges is not None:
        fwd = edges["parent"] + "|" + edges["child"]
        rev = edges["child"] + "|" + edges["parent"]
        idx_ref = ray.put(pd.Index(
            pd.concat([fwd, rev], ignore_index=True).unique()))

        def anti(b: pd.DataFrame, *, idx_ref) -> pd.DataFrame:
            idx = ray.get(idx_ref) if isinstance(idx_ref, ray.ObjectRef) \
                else idx_ref
            keys = b["id_lo"] + "|" + b["id_hi"]
            return b[idx.get_indexer(keys) == -1]

        return cand.map_batches(anti, fn_kwargs={"idx_ref": idx_ref},
                                batch_format="pandas")

    # distributed fallback: anti-join both orientations (undirected
    # "already connected")
    step1 = hash_join(cand, comp, on=["id_lo", "id_hi"],
                      right_on=["parent", "child"], how="left_anti")
    return hash_join(step1, comp, on=["id_hi", "id_lo"],
                     right_on=["parent", "child"], how="left_anti")


def kg_fuzzy_candidates(sf_dir: str):
    """Fuzzy tier (north-star J9): unresolved aliases scored against the
    token-blocked entity index: (nalias, entity_id, score)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..functions.normalize import norm_key_array
    from ..stages.fuzzy import fuzzy_resolve_unknowns
    from ..stages.shuffle import grouped_distinct

    ev = _mention_events(sf_dir)

    def unknowns(b: pa.Table) -> pa.Table:
        u = b.filter(pc.equal(b["a_status"], "unknown"))
        return pa.table({"nalias": norm_key_array(u["a"])})

    distinct = grouped_distinct(
        ev.map_batches(unknowns, batch_format="pyarrow"), ["nalias"],
        small_result=True)
    ents = pq.read_table(synth.ensure_synth(sf_dir)["entities"],
                         columns=["entity_id", "name"]).to_pandas()
    return fuzzy_resolve_unknowns(distinct, ents)


def kg_resolution_report(sf_dir: str):
    """J2 resolution-report side output (ref :1392-1440): per normalized
    alias that failed to resolve, (nalias, status, n)."""
    from ..functions.normalize import norm_key_array
    from ..stages.shuffle import grouped_agg
    import pyarrow as pa
    import pyarrow.compute as pc

    ev = _mention_events(sf_dir)

    def rows(b: pa.Table) -> pa.Table:
        bad = b.filter(pc.invert(pc.equal(b["a_status"], "resolved")))
        return pa.table({"nalias": norm_key_array(bad["a"]),
                         "status": bad["a_status"].combine_chunks()
                         if isinstance(bad["a_status"], pa.ChunkedArray)
                         else bad["a_status"]})

    return grouped_agg(ev.map_batches(rows, batch_format="pyarrow"),
                       ["nalias", "status"], [("n", None, "count")],
                       n_buckets=16)


def kg_tool_usage(sf_dir: str):
    """Distinct conversations per tool: (tool, n_convs) — A2 analogue."""
    import pyarrow.compute as pc

    paths = synth.ensure_synth(sf_dir)
    from ..state.checkpoint import read_parquet_auto
    turns = read_parquet_auto(paths["turns"], columns=["conv_id", "tool"])
    pairs = grouped_distinct(
        turns.map_batches(
            lambda t: t.filter(pc.is_valid(t["tool"])), batch_format="pyarrow"),
        ["tool", "conv_id"], small_result=True)
    return grouped_agg(pairs, ["tool"], [("n_convs", None, "count")],
                       small_result=True)
