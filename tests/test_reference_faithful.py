"""Triple-set P/R gate vs a reference-faithful eager extractor.

BASELINE.md's correctness gate: "emitted (subj, pred, obj) triple-set
P/R ≥ 0.95 vs the reference-faithful extractor oracle, under pytest".

The oracle here is a THIRD, independent implementation — an eager,
sequential, dict-and-loop Python program written in the reference's style
(``spreadsheet_loader.py``'s parse → index → resolve → derive flow, one row
at a time, no Ray, no SQL) — so agreement is evidence of the spec, not of
shared code.
"""

from __future__ import annotations

import re

import pyarrow.parquet as pq
import pytest

from xlsx_to_graphdb_ray import synth
from xlsx_to_graphdb_ray.functions.normalize import (
    ONT,
    RDF_TYPE,
    RDFS_LABEL,
    norm_key,
)

SF_DIR = "/root/testdata/sf0.001"

MENTION = re.compile(r"\[\[([^\]]+)\]\]")
RELATION = re.compile(
    r"\[\[([^\]]+)\]\] (includes|depends on|is replaced by|documents|aka)"
    r" \[\[([^\]]+)\]\]")
PRED = {"includes": "hasComponent", "depends on": "dependsOn",
        "is replaced by": "hasAlternate", "documents": "describes",
        "aka": "sameAs"}


def eager_reference_triples(sf_dir: str) -> set[tuple[str, str, str]]:
    """Sequential, in-memory extract→resolve→canonicalize→derive."""
    paths = synth.ensure_synth(sf_dir)
    ents = pq.read_table(paths["entities"]).to_pylist()
    turns = pq.read_table(paths["turns"]).to_pylist()
    turns.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))

    # name index + id fallback (T1/T2/J1)
    name_to_ids: dict[str, list[str]] = {}
    for e in ents:
        name_to_ids.setdefault(norm_key(e["name"]), []).append(e["entity_id"])
    id_map = {e["entity_id"].lower(): e["entity_id"] for e in ents}
    attrs = {e["entity_id"]: e for e in ents}

    def resolve(alias: str):
        n = norm_key(alias)
        cand = name_to_ids.get(n)
        if cand is None:
            return id_map.get(n)
        if len(cand) == 1:
            return cand[0]
        return None  # ambiguous

    # pass 1: per-conversation ordered scan with anaphora state
    mentions = []          # (conv, turn, entity_id or None)
    relations = []         # (conv, turn, pred, a_id, b_id)
    tools = []
    last_alias: dict[str, str | None] = {}
    for row in turns:
        conv, turn, text = row["conv_id"], row["turn_idx"], row["text"]
        found = MENTION.findall(text)
        resolved_aliases = []
        for a in found:
            if a == "that one":
                a = last_alias.get(conv) or "that one"
            resolved_aliases.append(a)
        for a in found:
            if a != "that one":
                last_alias[conv] = a
        for a in resolved_aliases:
            mentions.append((conv, turn, resolve(a)))
        m = RELATION.search(text)
        if m:
            a, rel, b = m.group(1), m.group(2), m.group(3)
            ra, rb = resolve(a), resolve(b)
            if ra and rb:
                relations.append((conv, turn, PRED[rel], ra, rb))
        if row["tool"] is not None:
            tools.append((conv, row["tool"]))

    # union-find over sameAs (canonicalization)
    parent: dict[str, str] = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for _, _, p, a, b in relations:
        if p == "sameAs":
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = sorted((ra, rb))
                parent[hi] = lo

    def canon(x):
        return find(x)

    triples: set[tuple[str, str, str]] = set()
    ent_uri = "urn:entity:{}".format
    mentioned = {canon(e) for _, _, e in mentions if e is not None}
    for cid in mentioned:
        a = attrs[cid]
        s = ent_uri(cid)
        name = a["name"] if a["name"] is not None else cid
        triples.add((s, RDF_TYPE, ONT + "Entity"))
        triples.add((s, ONT + "name", name))
        triples.add((s, RDFS_LABEL, name))
        for col, pred, uri in (("part_type", "hasPartType", True),
                               ("view", "hasView", True),
                               ("state", "hasState", True),
                               ("source", "hasSource", True),
                               ("revision", "hasRevision", False),
                               ("container", "inContainer", False)):
            v = a[col]
            if v is not None:
                triples.add((s, ONT + pred, (ONT + v) if uri else v))

    comp_edges = set()
    for _, _, p, a, b in relations:
        if p == "sameAs":
            continue
        ca, cb = canon(a), canon(b)
        triples.add((ent_uri(ca), ONT + p, ent_uri(cb)))
        if p == "hasComponent":
            triples.add((ent_uri(cb), ONT + "usedIn", ent_uri(ca)))
            comp_edges.add((ca, cb))

    # DFS closure (ref build_part_of_assembly_triples)
    children: dict[str, list[str]] = {}
    for p, c in comp_edges:
        children.setdefault(p, []).append(c)

    def desc(part, visited=None):
        if visited is None:
            visited = set()
        if part in visited:
            return set()
        visited.add(part)
        out = set()
        for ch in children.get(part, []):
            out.add(ch)
            out |= desc(ch, visited)
        return out

    for anc in {x for e in comp_edges for x in e}:
        for d in desc(anc):
            triples.add((ent_uri(d), ONT + "partOfAssembly", ent_uri(anc)))

    for conv, tool in set(tools):
        triples.add((f"urn:conv:{conv}", ONT + "usedTool", tool))
    return triples


def test_triple_set_precision_recall(ray_session):
    from xlsx_to_graphdb_ray.pipelines.queries import kg_triples

    got = set(map(tuple, kg_triples(SF_DIR).to_pandas()
                  [["subj", "pred", "obj"]].itertuples(index=False)))
    want = eager_reference_triples(SF_DIR)
    tp = len(got & want)
    precision = tp / len(got)
    recall = tp / len(want)
    assert precision >= 0.95, f"precision {precision:.4f}"
    assert recall >= 0.95, f"recall {recall:.4f}"
    # and in fact the sets should be identical
    assert got == want, (len(got - want), len(want - got))
