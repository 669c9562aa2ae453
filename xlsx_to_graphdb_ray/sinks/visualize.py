"""Bounded-BFS subgraph extraction + self-contained HTML/SVG rendering.

Re-expression of the reference's dev tool ``scripts/visualize_graph.py``:
``build_subgraph`` (:104-156) does a BFS from one root over the
parent→child edge list with a ``visited`` set, a ``max_depth`` cutoff and
a per-parent ``max_children`` cap, labels nodes through the name index,
and renders a hierarchical layout (matplotlib there).

Scale shape here: the full edge set NEVER reaches the driver. Each BFS
level is one broadcast-frontier filtered pass over the edges ``Dataset``
(the frontier is bounded by max_children^depth — a handful of ids — so it
rides into the tasks as a plain captured set), with the per-parent cap
applied inside each batch BEFORE collection so a hot parent with 10⁶
children ships at most ``max_children`` rows per block. ``max_depth``
levels → ``max_depth`` streaming passes, each collecting only the capped
next frontier. Labels resolve the same way: one filtered pass over the
entities table for exactly the subgraph's ids.

Rendering swaps matplotlib (not in this container) for a dependency-free
static SVG inside a single HTML file — the reference's 'hierarchical'
layout (depth = row, siblings spread), deterministic bytes for a given
subgraph.
"""

from __future__ import annotations

import html as _html
import os

import pandas as pd


def bounded_subgraph(edges_ds, root: str, max_depth: int = 4,
                     max_children: int | None = 10):
    """BFS from ``root`` over an (parent, child) edge Dataset.

    Returns ``(nodes, edges)`` pandas frames: nodes (id, depth) in BFS
    discovery order, edges (parent, child). Reference semantics
    (visualize_graph.py:126-153): a node is visited once at its first
    (shallowest) depth; expansion stops at ``max_depth``; at most
    ``max_children`` children per parent (deterministic: sorted by child
    id — the reference takes file order, which the Dataset does not have).
    """
    visited: dict[str, int] = {root: 0}
    edges_out: list[tuple[str, str]] = []
    frontier = [root]
    for depth in range(1, max_depth + 1):
        if not frontier:
            break
        want = frozenset(frontier)

        def grab(b: pd.DataFrame, want=want) -> pd.DataFrame:
            hit = b[b["parent"].isin(want)]
            if max_children is not None and len(hit):
                # per-batch pre-cap: bounds what leaves every block even
                # when one parent has millions of children
                hit = hit.sort_values(["parent", "child"]) \
                    .groupby("parent", sort=False).head(max_children)
            return hit[["parent", "child"]]

        step = edges_ds.map_batches(grab, batch_format="pandas").to_pandas()
        if not len(step):
            break
        step = step.drop_duplicates().sort_values(["parent", "child"])
        if max_children is not None:
            # re-cap after the cross-block combine (per-block caps can
            # admit up to n_blocks x max_children rows for one parent)
            step = step.groupby("parent", sort=False).head(max_children)
        nxt = []
        for parent, child in step.itertuples(index=False):
            edges_out.append((parent, child))
            if child not in visited:
                visited[child] = depth
                nxt.append(child)
        frontier = nxt

    nodes = pd.DataFrame({"id": list(visited), "depth": list(visited.values())})
    edges = pd.DataFrame(edges_out, columns=["parent", "child"]) \
        .drop_duplicates(ignore_index=True)
    return nodes, edges


def _layout(nodes: pd.DataFrame, x_gap: int = 170, y_gap: int = 110):
    """Hierarchical layout: depth = row; siblings spread evenly, rows
    centered on the widest one (the reference's 'hierarchical' mode)."""
    pos = {}
    by_depth = nodes.sort_values(["depth", "id"]).groupby("depth")["id"]
    widest = max((len(g) for _, g in by_depth), default=1)
    for depth, g in by_depth:
        ids = list(g)
        x0 = (widest - len(ids)) * x_gap / 2
        for i, nid in enumerate(ids):
            pos[nid] = (x0 + i * x_gap + x_gap / 2, depth * y_gap + 50)
    return pos, widest * x_gap, (int(nodes["depth"].max()) + 1) * y_gap if len(nodes) else y_gap


def render_html(nodes: pd.DataFrame, edges: pd.DataFrame,
                labels: dict[str, str] | None = None,
                title: str = "BOM subgraph") -> str:
    """One self-contained HTML document (inline SVG, no external assets)."""
    labels = labels or {}
    pos, w, h = _layout(nodes)
    parts = [f'<line x1="{pos[p][0]:.0f}" y1="{pos[p][1] + 18:.0f}" '
             f'x2="{pos[c][0]:.0f}" y2="{pos[c][1] - 18:.0f}" '
             'stroke="#888" marker-end="url(#arr)"/>'
             for p, c in edges.itertuples(index=False)
             if p in pos and c in pos]
    for nid, depth in nodes.sort_values(["depth", "id"]).itertuples(index=False):
        x, y = pos[nid]
        lbl = _html.escape(labels.get(nid, nid))
        fill = "#4a90d9" if depth == 0 else "#e8eef7"
        fg = "#fff" if depth == 0 else "#222"
        parts.append(
            f'<g><rect x="{x - 75:.0f}" y="{y - 16:.0f}" width="150" '
            f'height="32" rx="8" fill="{fill}" stroke="#46628a"/>'
            f'<text x="{x:.0f}" y="{y + 4:.0f}" text-anchor="middle" '
            f'font-size="11" fill="{fg}">{lbl[:24]}</text>'
            f'<title>{_html.escape(nid)}</title></g>')
    svg = "\n".join(parts)
    return f"""<!doctype html><html><head><meta charset="utf-8">
<title>{_html.escape(title)}</title></head><body>
<h3 style="font-family:sans-serif">{_html.escape(title)}
<small>({len(nodes)} nodes, {len(edges)} edges)</small></h3>
<svg xmlns="http://www.w3.org/2000/svg" width="{w:.0f}" height="{h + 60:.0f}"
     font-family="sans-serif">
<defs><marker id="arr" viewBox="0 0 10 10" refX="9" refY="5"
 markerWidth="7" markerHeight="7" orient="auto-start-reverse">
<path d="M 0 0 L 10 5 L 0 10 z" fill="#888"/></marker></defs>
{svg}
</svg></body></html>
"""


def visualize_kg(sf_dir: str, root: str, out_html: str,
                 max_depth: int = 4, max_children: int | None = 10) -> dict:
    """End-to-end: canonical hasComponent edges → bounded subgraph from
    ``root`` → labeled hierarchical SVG at ``out_html``. Returns a stats
    manifest (node/edge counts, path)."""
    from .. import synth
    from ..pipelines.queries import _canonical_component_edges
    from ..state.checkpoint import read_parquet_auto

    edges_ds = _canonical_component_edges(sf_dir)
    nodes, edges = bounded_subgraph(edges_ds, root, max_depth, max_children)

    ids = frozenset(nodes["id"])
    ent = read_parquet_auto(synth.ensure_synth(sf_dir)["entities"],
                            columns=["entity_id", "name"])
    got = ent.map_batches(
        lambda b: b[b["entity_id"].isin(ids)][["entity_id", "name"]],
        batch_format="pandas").to_pandas()
    labels = dict(zip(got["entity_id"], got["name"]))

    doc = render_html(nodes, edges, labels,
                      title=f"hasComponent subgraph of {root}")
    os.makedirs(os.path.dirname(os.path.abspath(out_html)), exist_ok=True)
    with open(out_html, "w", encoding="utf-8") as f:
        f.write(doc)
    return {"root": root, "nodes": int(len(nodes)), "edges": int(len(edges)),
            "out": out_html}
