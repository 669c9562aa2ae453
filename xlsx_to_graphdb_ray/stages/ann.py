"""Similarity search over an embedding column (``list<float>``).

- ``brute_force_topk`` — the exact baseline: the query matrix is broadcast
  once (``ray.put``); every batch does one numpy matmul against it and emits
  per-query partial top-k; a final small combine merges partials. No
  shuffle of the corpus, ever.
- ``lsh_topk`` — the scale path: random-hyperplane LSH buckets (signs of
  ``V @ P``) built per batch; queries probe only their own bucket (plus
  multi-probe neighbors), trading recall for touching a fraction of the
  corpus. Hyperplanes are seeded-deterministic.
- ``cosine_near_dup_pairs`` — embedding near-duplicate detection: all pairs
  with cosine ≥ τ, found per LSH bucket (candidate generation) and verified
  exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from .shuffle import bucketed_map_groups, grouped_agg


def _mat(col) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(vec_ds, query_ids: list[int], k: int = 10):
    """Exact cosine top-k per query vector (queries fetched by id from the
    corpus itself). Returns (query_id, rank, vec_id, sim) — sim rounded to
    6 dp, ties broken by vec_id; the query itself is excluded."""
    qset = set(query_ids)

    def grab_queries(b: pd.DataFrame) -> pd.DataFrame:
        m = b[b["vec_id"].isin(qset)]
        return m[["vec_id", "embedding"]]

    qdf = vec_ds.map_batches(grab_queries, batch_format="pandas").to_pandas()
    qdf = qdf.sort_values("vec_id").reset_index(drop=True)
    qmat = _normalize(_mat(qdf["embedding"]))
    q_ref = ray.put((qdf["vec_id"].to_numpy(), qmat))

    def partial(b: pd.DataFrame, *, q_ref, k) -> pd.DataFrame:
        qids, qm = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        vm = _normalize(_mat(b["embedding"]))
        sims = vm @ qm.T                                   # (batch, nq)
        vids = b["vec_id"].to_numpy()
        out = []
        for qi, qid in enumerate(qids):
            s = sims[:, qi]
            mask = vids != qid
            order = np.lexsort((vids[mask], -s[mask]))[:k]
            sel = np.flatnonzero(mask)[order]
            out.append(pd.DataFrame({
                "query_id": qid, "vec_id": vids[sel],
                "sim": s[sel]}))
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
            {"query_id": [], "vec_id": [], "sim": []})

    partials = vec_ds.map_batches(partial, fn_kwargs={"q_ref": q_ref, "k": k},
                                  batch_format="pandas")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for qid, grp in g.groupby("query_id", sort=False):
            grp = grp.sort_values(["sim", "vec_id"],
                                  ascending=[False, True]).head(k)
            grp = grp.assign(rank=np.arange(1, len(grp) + 1, dtype=np.int64))
            out.append(grp)
        return pd.concat(out, ignore_index=True)[
            ["query_id", "rank", "vec_id"]]

    return bucketed_map_groups(partials, ["query_id"], combine, n_buckets=8)


def exact_near_dup_pairs(vec_ds, tau: float = 0.95, block_rows: int = 4096):
    """EXACT embedding near-dup pairs (cosine ≥ τ, vec_a < vec_b): the
    distributed brute-force baseline. The corpus is snapshotted into
    normalized (ids, matrix) blocks in the object store; a Dataset over the
    upper-triangular block-pair grid fans the O(N²/2) comparisons out as
    independent matmul tasks — compute is quadratic (it's exact), but
    distributed and memory-bounded by ``block_rows``."""

    # snapshot normalized blocks from WORKER tasks: each map task ray.puts
    # its own (ids, matrix) block into the object store and returns only the
    # tiny ObjectRef — the corpus never transits the driver process; only
    # O(n_blocks) refs do
    def put_block(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["vec_id"].to_numpy()
        m = _normalize(_mat(b["embedding"]))
        return pd.DataFrame({"block_ref": [ray.put((ids, m))]})

    block_refs = [
        r["block_ref"]
        for r in vec_ds.map_batches(put_block, batch_format="pandas",
                                    batch_size=block_rows).take_all()]

    grid = [{"i": i, "j": j} for i in range(len(block_refs))
            for j in range(i, len(block_refs))]
    refs_ref = ray.put(block_refs)
    import ray.data as rd

    def compare(b: pd.DataFrame, *, refs_ref, tau) -> pd.DataFrame:
        refs = ray.get(refs_ref)
        out = []
        for i, j in zip(b["i"], b["j"]):
            ids_a, ma = ray.get(refs[i])
            ids_b, mb = ray.get(refs[j])
            sims = ma @ mb.T
            if i == j:
                iu, ju = np.triu_indices(len(ids_a), k=1)
            else:
                iu, ju = np.unravel_index(np.arange(sims.size),
                                          sims.shape)
            hit = sims[iu, ju] >= tau
            for x, y in zip(ids_a[iu[hit]], ids_b[ju[hit]]):
                lo, hi = (int(x), int(y)) if x < y else (int(y), int(x))
                if lo != hi:
                    out.append((lo, hi))
        return pd.DataFrame(out, columns=["vec_a", "vec_b"])

    return rd.from_items(grid).map_batches(
        compare, fn_kwargs={"refs_ref": refs_ref, "tau": tau},
        batch_size=4, batch_format="pandas")


_PLANE_CACHE: dict[tuple[int, int, int], np.ndarray] = {}


def ivf_topk(vec_ds, query_ids: list[int], k: int = 10,
             n_centroids: int | None = None, n_probe: int | None = None,
             train_sample: int = 4096, kmeans_iters: int = 5):
    """IVF (inverted-file) approximate top-k — the coarse-quantizer scale
    path next to ``lsh``: train a small centroid codebook on a bounded,
    deterministic, id-decorrelated sample (multiplicative-hash filter on
    vec_id — NOT first-N, which is biased whenever ids correlate with
    content; Lloyd iterations on the driver — the codebook is tiny),
    broadcast it once, then each batch only scores queries against vectors
    whose nearest centroid is one of the query's ``n_probe`` probed cells.

    ``n_centroids=None`` adapts to corpus size (≈√N, clamped [4, 1024]);
    ``n_probe=None`` probes a fixed fraction (half, floor 4) of the cells —
    the recall-leaning default this tier's tests pin at ≥0.9; at cluster
    scale pass explicit smaller ``n_probe`` for stronger pruning (scored
    fraction ≈ n_probe/n_centroids). Recall < 1 by design (documented;
    tested ≥0.9 on clustered corpora, including id-correlated clusters, vs
    ``brute_force_topk``). Returns (query_id, rank, vec_id) like the exact
    path. The corpus is never shuffled — same broadcast-combine topology as
    the brute-force baseline.
    """
    qset = set(query_ids)

    # --- codebook training: bounded deterministic sample (hash filter on
    # vec_id — no sort/shuffle of the corpus), driver Lloyd on the tiny
    # sample. Knuth multiplicative hash scrambles any id→cluster ordering,
    # so the sample stays representative when ids correlate with content.
    n_rows = vec_ds.count()
    rate = min(1.0, train_sample / max(n_rows, 1))
    threshold = int(rate * (1 << 32))

    def grab_sample(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["vec_id"].to_numpy().astype(np.uint64)
        keep = ((ids * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)) \
            < threshold
        return b[keep][["vec_id", "embedding"]]

    sample = vec_ds.map_batches(grab_sample, batch_format="pandas") \
        .to_pandas()
    if len(sample) == 0:
        # degenerate hash draw (tiny corpus / adversarial ids): fall back
        # to the first train_sample rows regardless of id values
        sample = vec_ds.limit(train_sample).to_pandas()[
            ["vec_id", "embedding"]]
    if len(sample) == 0:
        raise ValueError("ivf_topk: corpus is empty — nothing to train on")
    sample = sample.sort_values("vec_id").reset_index(drop=True)
    tm = _normalize(_mat(sample["embedding"]))
    if n_centroids is None:
        n_centroids = int(np.clip(round(np.sqrt(n_rows)), 4, 1024))
    n_centroids = max(1, min(n_centroids, len(tm)))
    if n_probe is None:
        n_probe = max(4, n_centroids // 2)
    cents = tm[:n_centroids].copy()          # deterministic init: first rows
    for _ in range(kmeans_iters):
        assign = np.argmax(tm @ cents.T, axis=1)
        for c in range(n_centroids):
            members = tm[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)

    def grab_queries(b: pd.DataFrame) -> pd.DataFrame:
        m = b[b["vec_id"].isin(qset)]
        return m[["vec_id", "embedding"]]

    qdf = vec_ds.map_batches(grab_queries, batch_format="pandas").to_pandas()
    qdf = qdf.sort_values("vec_id").reset_index(drop=True)
    qmat = _normalize(_mat(qdf["embedding"]))
    # per query: the n_probe nearest centroid cells
    probes = np.argsort(-(qmat @ cents.T), axis=1)[:, :n_probe]
    ref = ray.put((qdf["vec_id"].to_numpy(), qmat, cents, probes))

    def partial(b: pd.DataFrame, *, ref, k) -> pd.DataFrame:
        qids, qm, cc, pr = ray.get(ref) if isinstance(ref, ray.ObjectRef) \
            else ref
        vm = _normalize(_mat(b["embedding"]))
        vids = b["vec_id"].to_numpy()
        cell = np.argmax(vm @ cc.T, axis=1)
        out = []
        for qi, qid in enumerate(qids):
            probe_mask = np.isin(cell, pr[qi]) & (vids != qid)
            if not probe_mask.any():
                continue
            s = (vm[probe_mask] @ qm[qi])
            sel_ids = vids[probe_mask]
            order = np.lexsort((sel_ids, -s))[:k]
            out.append(pd.DataFrame({
                "query_id": qid, "vec_id": sel_ids[order],
                "sim": s[order]}))
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
            {"query_id": pd.Series([], dtype="int64"),
             "vec_id": pd.Series([], dtype="int64"),
             "sim": pd.Series([], dtype="float64")})

    partials = vec_ds.map_batches(partial, fn_kwargs={"ref": ref, "k": k},
                                  batch_format="pandas")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for qid, grp in g.groupby("query_id", sort=False):
            grp = grp.sort_values(["sim", "vec_id"],
                                  ascending=[False, True]).head(k)
            grp = grp.assign(rank=np.arange(1, len(grp) + 1, dtype=np.int64))
            out.append(grp)
        if not out:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "rank": pd.Series([], dtype="int64"),
                                 "vec_id": pd.Series([], dtype="int64")})
        return pd.concat(out, ignore_index=True)[
            ["query_id", "rank", "vec_id"]]

    return bucketed_map_groups(partials, ["query_id"], combine, n_buckets=8)


def centroid_assign(vec_ds, n_centroids: int = 16):
    """Nearest-centroid assignment — the partition step of k-means / IVF
    clustering as a standalone operator. Centroids are the corpus vectors
    with ``vec_id < n_centroids`` (deterministic seed choice, so a SQL
    oracle can reproduce the exact same clustering). Returns
    (vec_id, centroid_id); ties broken toward the lowest centroid id
    (numpy argmax-first == SQL row_number ORDER BY sim DESC, cid).

    Scale topology: the centroid matrix is tiny and broadcast once
    (``ray.put``); every batch does one matmul — the corpus is never
    shuffled, output streams."""

    def grab_seeds(b: pd.DataFrame) -> pd.DataFrame:
        m = b[b["vec_id"] < n_centroids]
        return m[["vec_id", "embedding"]]

    sdf = vec_ds.map_batches(grab_seeds, batch_format="pandas").to_pandas()
    sdf = sdf.sort_values("vec_id").reset_index(drop=True)
    if not len(sdf):
        raise ValueError("centroid_assign: no vectors with "
                         f"vec_id < {n_centroids} to seed centroids")
    smat = _normalize(_mat(sdf["embedding"]))
    ref = ray.put((sdf["vec_id"].to_numpy(), smat))

    def assign(b: pd.DataFrame, *, ref) -> pd.DataFrame:
        cids, sm = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        vm = _normalize(_mat(b["embedding"]))
        best = np.argmax(vm @ sm.T, axis=1)   # first max → lowest cid
        return pd.DataFrame({"vec_id": b["vec_id"].to_numpy(),
                             "centroid_id": cids[best]})

    return vec_ds.map_batches(assign, fn_kwargs={"ref": ref},
                              batch_format="pandas")


def _hyperplanes(dim: int, n_planes: int, seed: int = 1234) -> np.ndarray:
    """Seeded-deterministic hyperplanes, cached per (dim, n_planes, seed) —
    identical in every task that asks for the same shape, so they need no
    broadcast and adapt to whatever embedding dim the corpus actually has."""
    key = (dim, n_planes, seed)
    if key not in _PLANE_CACHE:
        rng = np.random.default_rng(seed)
        _PLANE_CACHE[key] = rng.normal(size=(dim, n_planes))
    return _PLANE_CACHE[key]


def lsh_bucket_ids(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes) >= 0
    weights = (1 << np.arange(planes.shape[1])).astype(np.int64)
    return bits.astype(np.int64) @ weights


def cosine_near_dup_pairs(vec_ds, tau: float = 0.95, n_planes: int = 8):
    """Embedding near-duplicate pairs: cosine ≥ τ with doc_a < doc_b.

    Candidate generation = random-hyperplane LSH buckets (near-identical
    vectors share all sign bits with overwhelming probability at τ≥0.95);
    exact verification inside each bucket. Scale: each bucket holds ~N/2^b
    vectors, verified with one local matmul.
    """
    def assign(b: pd.DataFrame) -> pd.DataFrame:
        m = _normalize(_mat(b["embedding"]))
        # dim taken from the data; seeded generation is deterministic across
        # tasks, so no broadcast is needed (planes are dim x n_planes, tiny)
        pl = _hyperplanes(m.shape[1], n_planes)
        return pd.DataFrame({
            "bucket_id": lsh_bucket_ids(m, pl),
            "vec_id": b["vec_id"].values,
            "embedding": list(m),
        })

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in g.groupby("bucket_id", sort=False):
            if len(grp) < 2:
                continue
            grp = grp.sort_values("vec_id")
            m = np.asarray(list(grp["embedding"]))
            sims = m @ m.T
            ids = grp["vec_id"].to_numpy()
            iu, ju = np.triu_indices(len(ids), k=1)
            hit = sims[iu, ju] >= tau
            for i, j, s in zip(iu[hit], ju[hit], sims[iu, ju][hit]):
                out.append((ids[i], ids[j], round(float(s), 6)))
        return pd.DataFrame(out, columns=["vec_a", "vec_b", "sim"])

    assigned = vec_ds.map_batches(assign, batch_format="pandas")
    return bucketed_map_groups(assigned, ["bucket_id"], verify, n_buckets=16)


def vec_dup_clusters(vec_ds, tau: float = 0.95):
    """(vec_id, keep_id) — collapse exact embedding near-dups (cosine ≥ τ)
    into clusters: connected components of the ``exact_near_dup_pairs``
    graph, each member mapped to its cluster's MIN vec_id. Only
    non-representative members are returned (the delta removal map) —
    same contract as ``dedup_docs.dup_clusters`` for text."""
    from .canonicalize import sameas_components

    pairs = exact_near_dup_pairs(vec_ds, tau=tau).map_batches(
        lambda b: pd.DataFrame({"a_id": b["vec_a"], "b_id": b["vec_b"]}),
        batch_format="pandas")
    delta = sameas_components(pairs)
    return pd.DataFrame({"vec_id": delta["entity_id"].astype("int64"),
                         "keep_id": delta["canon_id"].astype("int64")})
