"""Document deduplication family (training-data-pipeline operators).

All hashing is md5-based so the DuckDB oracles can reproduce results
bit-for-bit (``md5`` exists on both sides). MinHash signatures exploit the
fact that the minimum over fixed-width hex strings equals the minimum over
the underlying 128-bit integers: the reduction runs numerically as two
``np.minimum.reduceat`` passes over (hi, lo) uint64 word pairs, and only
the final per-doc minima are re-hexed (see ``minhash_signatures``).

Operators:

- exact dedup          → md5(text) two-phase grouped min (D1 first-wins)
- MinHash + LSH        → shingle → K md5-seeded minhashes → band buckets →
                         candidate pairs per bucket → exact-Jaccard verify
- n-gram Jaccard pairs → inverted shingle index join → pairwise verify
- SimHash              → 64-bit md5-derived simhash per doc + banded
                         Hamming-LSH pairs (exact for hamming ≤ 3)
- embedding near-dup   → see stages/ann.py (cosine blocking)
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .joins import hash_join
from .shuffle import bucketed_map_groups, grouped_agg, grouped_distinct

K_HASHES = 16
N_BANDS = 8           # 2 rows per band → P(collide) = 1-(1-J²)^8 ≈ .99 at J=.67
SHINGLE_W = 3
JACCARD_T = 0.35


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def shingles(text: str, w: int = SHINGLE_W) -> list[str]:
    toks = text.split(" ")
    if len(toks) < w:
        return [" ".join(toks)] if toks != [""] else []
    return sorted({" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)})


def exact_dedup(docs_ds):
    """Exact dedup by content hash, first-wins by doc_id (D1 analogue):
    returns (text_md5, keep_id, n_copies)."""

    def key(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "text_md5": [_md5(t) for t in b["text"]],
            "doc_id": b["doc_id"],
        })

    return grouped_agg(docs_ds.map_batches(key, batch_format="pandas"),
                       ["text_md5"],
                       [("keep_id", "doc_id", "min"),
                        ("n_copies", None, "count")], n_buckets=16)


# per-shingle seeded md5s memoized per worker (near-dup corpora repeat
# shingles heavily — a cache hit replaces K md5 calls), stored as two
# uint64 halves so the per-doc minimum is numeric, not string compares
_SHINGLE_HASH_CACHE: dict[str, tuple[np.ndarray, np.ndarray]] = {}
_SHINGLE_HASH_CACHE_MAX = 2_000_000
_SHINGLE_HASH_CACHE_K = [0]       # k the cached rows were built for


def _shingle_hash_matrix(uniq, k: int) -> tuple[np.ndarray, np.ndarray]:
    cache = _SHINGLE_HASH_CACHE
    # cached rows are k-wide; a different k in the same worker process must
    # not reuse them (wrong-width broadcast) — clear and re-key
    if _SHINGLE_HASH_CACHE_K[0] != k:
        cache.clear()
        _SHINGLE_HASH_CACHE_K[0] = k
    if len(cache) > _SHINGLE_HASH_CACHE_MAX:
        cache.clear()
    hi = np.empty((len(uniq), k), dtype=np.uint64)
    lo = np.empty((len(uniq), k), dtype=np.uint64)
    md5 = hashlib.md5
    get = cache.get
    miss: list[int] = []
    for r, s in enumerate(uniq):
        v = get(s)
        if v is None:
            miss.append(r)
        else:
            hi[r], lo[r] = v
    if miss:
        # one contiguous digest buffer for all misses, decoded in a single
        # frombuffer pass (md5 digest bytes ≡ big-endian u64 pair)
        parts: list[bytes] = []
        for r in miss:
            s = uniq[r]
            parts.extend(md5(f"{i}|{s}".encode("utf-8")).digest()
                         for i in range(k))
        arr = np.frombuffer(b"".join(parts), dtype=">u8") \
            .reshape(len(miss), k, 2).astype(np.uint64)
        mi = np.asarray(miss, dtype=np.int64)
        hi[mi] = arr[:, :, 0]
        lo[mi] = arr[:, :, 1]
        for j, r in enumerate(miss):
            cache[uniq[r]] = (arr[j, :, 0], arr[j, :, 1])
    return hi, lo


def minhash_signatures(b: pd.DataFrame, k: int = K_HASHES,
                       with_shingles: bool = True) -> pd.DataFrame:
    """Per-doc MinHash signature: sig[i] = min over shingles of
    md5(f"{i}|{shingle}") — a fixed-width hex string; its min is the min of
    the underlying 128-bit integer, so the reduction runs as two numeric
    ``np.minimum.reduceat`` passes (hi words, then lo words among the hi
    minima) over the exploded shingle matrix. One md5 set per *unique*
    shingle, memoized across batches. ``with_shingles=False`` omits the
    shingle-list column (the banding path never ships shingles — see
    ``minhash_lsh_pairs``)."""
    sh_lists = [shingles(t) for t in b["text"]]
    counts = np.fromiter((len(x) for x in sh_lists), dtype=np.int64,
                         count=len(sh_lists))
    sigs: list[list[str]] = [["z" * 32] * k for _ in sh_lists]
    if counts.sum() > 0:
        flat = np.asarray([s for sl in sh_lists for s in sl], dtype=object)
        uniq, inv = np.unique(flat, return_inverse=True)
        uhi, ulo = _shingle_hash_matrix(uniq, k)
        hi, lo = uhi[inv], ulo[inv]                     # (total, k)
        nz = counts > 0
        nz_counts = counts[nz]
        offsets = np.zeros(len(nz_counts), dtype=np.int64)
        np.cumsum(nz_counts[:-1], out=offsets[1:])
        min_hi = np.minimum.reduceat(hi, offsets, axis=0)
        hi_exp = np.repeat(min_hi, nz_counts, axis=0)
        lo_m = np.where(hi == hi_exp, lo,
                        np.uint64(0xFFFFFFFFFFFFFFFF))
        min_lo = np.minimum.reduceat(lo_m, offsets, axis=0)
        # hex all signatures in ONE pass (numpy-scalar f-string formatting
        # is ~60µs each; bytes.hex of the packed big-endian buffer is not)
        packed = np.empty((len(min_hi), k, 2), dtype=">u8")
        packed[:, :, 0] = min_hi
        packed[:, :, 1] = min_lo
        hexes = packed.tobytes().hex()
        for r, d in enumerate(np.flatnonzero(nz)):
            base = r * k * 32
            sigs[d] = [hexes[base + i * 32: base + (i + 1) * 32]
                       for i in range(k)]
    out = pd.DataFrame({"doc_id": b["doc_id"].values})
    out["sig"] = sigs
    if with_shingles:
        out["shingles"] = sh_lists
    return out


# per-group blocking-join guard: a band bucket (or name/prefix block) with
# more than this many members is truncated to the first MAX_GROUP_MEMBERS
# sorted ids before pair emission — bounds the O(group²) fan-out against an
# adversarial hot key (the reference caps fan-out the same way,
# ingest_changes.py:144 ``matched[:5]``). Far above any observed group size
# on real corpora (sf0.1 band buckets: ≤ a few dozen), so oracle parity is
# unaffected; at 100 TB a hotter bucket means the docs are near-identical
# en masse and any MAX_GROUP_MEMBERS representatives carry the signal.
MAX_GROUP_MEMBERS = 512

# candidate-pair volume above which minhash verification switches from the
# broadcast semi-join fast path (collect pairs, ray.put the involved-id set,
# one filtered streaming pass) to the fully-distributed hash-join path
PAIR_DRIVER_LIMIT = 500_000

# lean (band_key, doc_id) row volume (= N_BANDS × n_docs, ~70 B/row) under
# which candidate generation runs as one driver-side pandas groupby instead
# of a hash exchange — the exchange's fixed aggregator startup dwarfs the
# group work at this size (same guarded dual-path as closure's edge collect)
BAND_DRIVER_LIMIT = 2_000_000

# observability: which dispatch tier the LAST minhash_lsh_pairs call in
# this process took ("driver" | "exchange" | "hash-join") — bench.py
# records it so tier flips between rounds are visible in BENCH_r{N}.json
LAST_MINHASH_TIER: str | None = None


def minhash_lsh_pairs(docs_ds, jaccard_t: float = JACCARD_T):
    """Near-dup pairs via MinHash banding + exact verification.

    shingle→minhash per batch → explode to lean (band_key, doc_id) rows →
    groupby band bucket → candidate id pairs within bucket → exact-Jaccard
    verify of the candidates. Returns (doc_a, doc_b, jaccard) with
    doc_a < doc_b, jaccard rounded to 6 dp.

    Scale shape: the band exchange carries only ids + band keys (the
    round-2 version duplicated each doc's full shingle set across its
    N_BANDS band rows — ~8× corpus shingle bytes through the shuffle).
    The verify stage is dual-path on the candidate volume, like
    ``canonicalize``/``closure``:

    - band rows ≤ ``BAND_DRIVER_LIMIT`` (N_BANDS × n_docs lean rows):
      candidate generation is one driver-side pandas groupby — ZERO
      exchanges end-to-end;
    - else candidates ≤ ``PAIR_DRIVER_LIMIT``: one band-bucket exchange
      generates candidates distributed, the id pairs collect to the driver;
    - in both cases the verify broadcasts the involved-id set (``ray.put``
      once), filter-and-shingles ONLY those docs in a single streaming
      pass over the corpus (no shuffle), and intersects driver-side —
      near-dup pairs are a sliver of the corpus, so this is the
      overwhelmingly common regime;
    - past both guards: hash-join the deduped candidates back against a
      one-copy (doc_id, shingles) side — each shingle set transits the
      exchange exactly once.
    """
    rows_per_band = K_HASHES // N_BANDS

    def bands(b: pd.DataFrame) -> pd.DataFrame:
        sigd = minhash_signatures(b, with_shingles=False)
        out = []
        for did, sig in zip(sigd["doc_id"], sigd["sig"]):
            for band in range(N_BANDS):
                key = f"{band}|" + "|".join(
                    sig[band * rows_per_band:(band + 1) * rows_per_band])
                out.append((key, did))
        return pd.DataFrame(out, columns=["band_key", "doc_id"])

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        from .joins import group_pairs
        p = group_pairs(g, "band_key", "doc_id", MAX_GROUP_MEMBERS)
        return p[["id_lo", "id_hi"]].rename(
            columns={"id_lo": "doc_a", "id_hi": "doc_b"})

    banded = docs_ds.map_batches(bands, batch_format="pandas")

    global LAST_MINHASH_TIER
    # --- fast path A: lean band rows fit the driver → no exchange at all ----
    try:
        pairs = bucket_pairs(banded.to_pandas(limit=BAND_DRIVER_LIMIT))
        LAST_MINHASH_TIER = "driver"
    except ValueError:
        # --- fast path B: exchange for candidates, collect the id pairs -----
        cand = bucketed_map_groups(banded, ["band_key"], bucket_pairs)
        try:
            pairs = cand.to_pandas(limit=PAIR_DRIVER_LIMIT)
            LAST_MINHASH_TIER = "exchange"
        except ValueError:
            pairs = None
            LAST_MINHASH_TIER = "hash-join"
    if pairs is not None:
        # a pair can collide in several bands → dedup (driver-side here;
        # the fallback uses the grouped_distinct exchange instead)
        pairs = pairs.drop_duplicates(ignore_index=True)
        ids = np.unique(pairs[["doc_a", "doc_b"]].to_numpy().ravel()) \
            if len(pairs) else np.empty(0, dtype=np.int64)
        ids_ref = ray.put(np.sort(ids.astype(np.int64)))

        def sh_of_candidates(b: pd.DataFrame) -> pd.DataFrame:
            want = ray.get(ids_ref)
            sub = b[np.isin(b["doc_id"].to_numpy(), want)]
            return pd.DataFrame({
                "doc_id": sub["doc_id"].values,
                "sh": ["\x1f".join(shingles(t)) for t in sub["text"]]})

        sh_df = docs_ds.map_batches(sh_of_candidates, batch_format="pandas") \
            .to_pandas() if len(ids) else pd.DataFrame(columns=["doc_id", "sh"])
        sets = {int(d): set(s.split("\x1f"))
                for d, s in zip(sh_df["doc_id"], sh_df["sh"])}
        out = []
        for da, db in zip(pairs.get("doc_a", []), pairs.get("doc_b", [])):
            xa, xb = sets[int(da)], sets[int(db)]
            union = len(xa | xb)
            jac = len(xa & xb) / union if union else 0.0
            if jac >= jaccard_t:
                out.append((int(da), int(db), round(jac, 6)))
        res = pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"]) \
            .astype({"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"})
        return ray.data.from_pandas(res)

    # --- fallback: distributed verify (candidates past the driver guard) ----
    cand = grouped_distinct(cand, ["doc_a", "doc_b"], n_buckets=16)

    # one-copy shingle side (no md5 work here — shingling is string ops)
    def sh_side(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"].values,
            "sh": ["\x1f".join(shingles(t)) for t in b["text"]]})

    side = docs_ds.map_batches(sh_side, batch_format="pandas")
    # re-cast ids to int64 between joins: hash_join's union-pad promotes the
    # non-key side's ids to float64 (NaN padding), and the bucket hash is a
    # STRING hash — "278.0" and "278" land in different buckets
    j1 = hash_join(cand, side, on=["doc_a"], right_on=["doc_id"],
                   n_buckets=16).map_batches(
        lambda b: pd.DataFrame({"doc_a": b["doc_a"].astype("int64"),
                                "doc_b": b["doc_b"].astype("int64"),
                                "sh_a": b["sh"]}), batch_format="pandas")
    j2 = hash_join(j1, side, on=["doc_b"], right_on=["doc_id"],
                   n_buckets=16)

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        out = []
        for da, db, sa, sb in zip(b["doc_a"], b["doc_b"], b["sh_a"], b["sh"]):
            xa, xb = set(sa.split("\x1f")), set(sb.split("\x1f"))
            union = len(xa | xb)
            jac = len(xa & xb) / union if union else 0.0
            if jac >= jaccard_t:
                out.append((int(da), int(db), round(jac, 6)))
        df = pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"])
        return df.astype({"doc_a": "int64", "doc_b": "int64",
                          "jaccard": "float64"})

    return j2.map_batches(verify, batch_format="pandas")


def dup_clusters(docs_ds, jaccard_t: float = JACCARD_T):
    """(doc_id, keep_id) — collapse near-duplicates into clusters: the
    connected components of the MinHash near-dup pair graph, each member
    mapped to its cluster's MIN doc_id (the kept representative). Only
    non-representative members are returned — the delta removal map a
    dedup filter consumes directly (docs in no cluster keep themselves).

    Components via ``stages/canonicalize.sameas_components``: union-find
    on the driver while the PAIR list (already tiny relative to the
    corpus) fits ``DRIVER_LIMIT``, distributed min-label propagation past
    it — same dual-path contract as the sameAs canonicalization.
    """
    from .canonicalize import sameas_components

    pairs = minhash_lsh_pairs(docs_ds, jaccard_t=jaccard_t).map_batches(
        lambda b: pd.DataFrame({"a_id": b["doc_a"], "b_id": b["doc_b"]}),
        batch_format="pandas")
    delta = sameas_components(pairs)
    return pd.DataFrame({"doc_id": delta["entity_id"].astype("int64"),
                         "keep_id": delta["canon_id"].astype("int64")})


def dedup_corpus(docs_ds, jaccard_t: float = JACCARD_T):
    """(doc_id, is_cluster_rep) — the END-TO-END near-dup dedup a corpus
    builder actually runs: every document that survives MinHash+LSH
    near-dup collapse. Non-representative cluster members are dropped;
    each cluster's MIN doc_id survives with ``is_cluster_rep=1``; docs in
    no cluster survive with 0.

    Scale shape: ``dup_clusters`` already yields the DELTA removal map
    (cluster members only — bounded by duplicate mass, not corpus size,
    and dual-path driver/distributed underneath). The map is broadcast
    once via ``ray.put`` and the corpus streams through one vectorized
    ``np.isin`` filter pass — the dedup filter itself adds zero shuffles.
    A corpus whose duplicate mass outgrows broadcast would route the
    filter through ``joins.hash_join(left_anti)`` instead (the pattern
    ``kg_prefix_pairs`` guards with); at that point near-everything is a
    duplicate and the cluster collapse, not the filter, is the cost.
    """
    delta = dup_clusters(docs_ds, jaccard_t=jaccard_t)
    removed = np.sort(delta["doc_id"].to_numpy().astype(np.int64))
    reps = np.unique(delta["keep_id"].to_numpy().astype(np.int64))
    removed_ref = ray.put(removed)
    reps_ref = ray.put(reps)

    def keep(b: pd.DataFrame, *, removed_ref, reps_ref) -> pd.DataFrame:
        rm = ray.get(removed_ref) if isinstance(removed_ref, ray.ObjectRef) \
            else removed_ref
        rp = ray.get(reps_ref) if isinstance(reps_ref, ray.ObjectRef) \
            else reps_ref
        ids = b["doc_id"].to_numpy().astype("int64")
        surv = ids[~np.isin(ids, rm)]
        return pd.DataFrame({
            "doc_id": surv,
            "is_cluster_rep": np.isin(surv, rp).astype("int64")})

    return docs_ds.map_batches(
        keep, fn_kwargs={"removed_ref": removed_ref, "reps_ref": reps_ref},
        batch_format="pandas")


def ngram_jaccard_pairs(docs_ds, jaccard_t: float = JACCARD_T):
    """Exact n-gram-Jaccard near-dup join (no sketching): inverted shingle
    index → co-occurring doc pairs → full verify. The candidate generator
    counts shared shingles per pair, so Jaccard is computed from counts
    without re-reading documents: J = shared / (|A| + |B| - shared).
    Returns (doc_a, doc_b, jaccard)."""

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, t in zip(b["doc_id"], b["text"]):
            sh = shingles(t)
            n = len(sh)
            for s in sh:
                rows.append((s, did, n))
        return pd.DataFrame(rows, columns=["shingle", "doc_id", "n_sh"])

    # frequency cap: a shingle shared by more than MAX_DF docs is too common
    # to be a useful near-dup signal and would explode the pair count at
    # scale; the SQL oracle applies the same cap.
    MAX_DF = 50

    def pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in g.groupby("shingle", sort=False):
            if len(grp) < 2 or len(grp) > MAX_DF:
                continue
            grp = grp.sort_values("doc_id")
            recs = list(zip(grp["doc_id"], grp["n_sh"]))
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    out.append((recs[i][0], recs[j][0],
                                recs[i][1], recs[j][1]))
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "na", "nb"])

    exploded = docs_ds.map_batches(explode, batch_format="pandas")
    co = bucketed_map_groups(exploded, ["shingle"], pairs_in_group)
    shared = grouped_agg(co, ["doc_a", "doc_b"],
                         [("shared", None, "count"),
                          ("na", "na", "min"), ("nb", "nb", "min")],
                         n_buckets=16)

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        union = b["na"] + b["nb"] - b["shared"]
        jac = (b["shared"] / union).round(6)
        keep = jac >= jaccard_t
        return pd.DataFrame({"doc_a": b["doc_a"][keep],
                             "doc_b": b["doc_b"][keep],
                             "jaccard": jac[keep]})

    return shared.map_batches(verify, batch_format="pandas")


# md5 token hashes memoized per worker process: natural-language token
# vocabularies are heavy-tailed, so across batches most tokens are repeats
# and cost a dict hit instead of an md5
_TOKEN_HASH_CACHE: dict[str, int] = {}
_TOKEN_HASH_CACHE_MAX = 1_000_000


def _token_hashes(tokens) -> np.ndarray:
    cache = _TOKEN_HASH_CACHE
    if len(cache) > _TOKEN_HASH_CACHE_MAX:
        cache.clear()
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, tok in enumerate(tokens):
        h = cache.get(tok)
        if h is None:
            h = int(_md5(tok)[:16], 16)
            cache[tok] = h
        out[i] = h
    return out


def simhash_docs(docs_ds):
    """64-bit SimHash per doc (token-level; md5-derived bit planes).

    Vectorized: one md5 per *unique* token in the batch (memoized across
    batches per worker), then the per-doc ±1 bit-plane accumulation is a
    single ``np.add.reduceat`` over the exploded token matrix — no per-doc
    per-token Python loop.

    Oracle-checked bit-for-bit (``docs_simhash``): DuckDB reproduces the
    DISTINCT-token md5→uint64 planes and the per-bit ±1 sums in SQL.
    """

    def sim(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"doc_id": [], "simhash": []})
        tok_sets = [sorted(set(t.split(" ")))
                    for t in b["text"].fillna("")]
        counts = np.fromiter((len(x) for x in tok_sets), dtype=np.int64,
                             count=len(tok_sets))
        flat = [tok for ts in tok_sets for tok in ts]
        uniq, inv = np.unique(np.asarray(flat, dtype=object),
                              return_inverse=True)
        hashes = _token_hashes(uniq)                       # (U,) uint64
        shifts = np.arange(64, dtype=np.uint64)
        planes = ((hashes[:, None] >> shifts) & 1).astype(np.int32)
        pm = planes * 2 - 1                                # (U, 64) of ±1
        doc_rows = pm[inv]                                 # (sum(counts), 64)
        offsets = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=offsets[1:])
        acc = np.add.reduceat(doc_rows, offsets, axis=0)   # (n_docs, 64)
        bits = (acc >= 0).astype(np.uint64)
        out = np.bitwise_or.reduce(bits << shifts, axis=1)
        # two's-complement reinterpret → plain int64 column (the SQL oracle
        # folds its HUGEINT the same way)
        return pd.DataFrame({"doc_id": b["doc_id"].values,
                             "simhash": out.view(np.int64)})

    return docs_ds.map_batches(sim, batch_format="pandas")


def hamming(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count)."""
    return np.unpackbits(x.astype(np.uint64).view(np.uint8)) \
        .reshape(-1, 8 * 8).sum(axis=1)


def simhash_pairs(docs_ds, max_hamming: int = 3,
                  max_group: int | None = None):
    """SimHash near-dup pairs: (doc_a, doc_b, hamming ≤ ``max_hamming``).

    Banded Hamming LSH that is EXACT, not approximate: the 64-bit
    signature splits into 4 disjoint 16-bit bands, and by pigeonhole any
    pair differing in ≤3 bits agrees on at least one whole band — so
    bucketing on (band_idx, band_bits) finds every qualifying pair while
    only ever comparing within buckets (never all-pairs). Completeness
    holds for ``max_hamming ≤ 3``; the full-cross-join SQL oracle verifies
    it (``docs_simhash_pairs``).

    Scale: each band row is 24 bytes (band_key, doc_id, sig) — no payload
    duplication through the exchange (cf. the MinHash band-payload lesson);
    65k bucket keys per band spread the shuffle. In-bucket compare cost is
    capped at ``max_group`` (default MAX_GROUP_MEMBERS) DISTINCT
    signatures per bucket — identical-signature runs (the core dedup
    workload: byte-identical duplicate families) are exempt from the cap:
    their pairs all qualify at hamming 0 with zero popcount compares, so a
    duplicate family LARGER than the cap still emits every pair (compute
    stays cap-bounded; only true output is quadratic). Cross-run pairs
    compare one representative per distinct signature then expand to the
    id cross product. Exactness therefore holds whenever a band bucket
    has ≤ ``max_group`` distinct signatures — a bound adversarial inputs
    can exceed, dup-heavy real ones don't.
    """
    if max_hamming > 3:
        raise ValueError("4x16-bit banding is only complete for "
                         "max_hamming <= 3")
    if max_group is None:
        max_group = MAX_GROUP_MEMBERS
    sigs = simhash_docs(docs_ds)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):
            return pd.DataFrame({"band_key": pd.Series([], dtype="int64"),
                                 "doc_id": pd.Series([], dtype="int64"),
                                 "sig": pd.Series([], dtype="int64")})
        sig = b["simhash"].to_numpy(dtype="int64").view(np.uint64)
        n = len(sig)
        bands = np.arange(4, dtype=np.uint64)
        keys = (np.repeat(bands, n) << np.uint64(16)) \
            | ((np.tile(sig, 4) >> np.repeat(bands * np.uint64(16), n))
               & np.uint64(0xFFFF))
        return pd.DataFrame({
            "band_key": keys.astype(np.int64),
            "doc_id": np.tile(b["doc_id"].to_numpy(), 4),
            "sig": np.tile(sig, 4).view(np.int64),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for key, grp in g.groupby("band_key", sort=False):
            if len(grp) < 2:
                continue
            grp = grp.sort_values(["sig", "doc_id"], kind="mergesort")
            sig = grp["sig"].to_numpy(dtype="int64").view(np.uint64)
            ids = grp["doc_id"].to_numpy()
            run_start = np.concatenate(([True], sig[1:] != sig[:-1]))
            starts = np.flatnonzero(run_start)
            ends = np.append(starts[1:], len(sig))
            # identical-signature runs: every pair qualifies at hamming 0,
            # and identical sigs collide in ALL four bands — emit from
            # band 0 only (no cross-band duplicate work), UNCAPPED: the
            # cap bounds popcount compares and these need none; capping
            # them would drop qualifying pairs for dup families larger
            # than the cap (round-3 advisor finding)
            if (int(key) >> 16) == 0:
                run_sizes = ends - starts
                for s, e in zip(starts[run_sizes >= 2],
                                ends[run_sizes >= 2]):
                    rids = ids[s:e]
                    iu, ju = np.triu_indices(e - s, k=1)
                    out.append(pd.DataFrame({
                        "doc_a": rids[iu], "doc_b": rids[ju],
                        "hamming": np.zeros(len(iu), dtype=np.int64)}))
            # cross-run pairs: ONE popcount per distinct-signature pair
            # (capped at max_group distinct sigs), qualifying run pairs
            # expand to the full id cross product (output-bounded)
            n_runs = min(len(starts), max_group)
            if len(starts) > max_group:
                # no-silent-caps: past this point exactness vs the
                # full-cross-join contract can break — make it observable
                # (same discipline as LAST_MINHASH_TIER)
                logging.getLogger(__name__).warning(
                    "simhash_pairs: band bucket %d has %d distinct "
                    "signatures > max_group=%d; pairs among the %d "
                    "truncated runs are dropped", int(key), len(starts),
                    max_group, len(starts) - max_group)
            if n_runs < 2:
                continue
            usig = sig[starts[:n_runs]]
            iu, ju = np.triu_indices(n_runs, k=1)
            ham = _popcount64(usig[iu] ^ usig[ju])
            keep = ham <= max_hamming
            for i, j, h in zip(iu[keep], ju[keep], ham[keep]):
                a, b = ids[starts[i]:ends[i]], ids[starts[j]:ends[j]]
                pa_, pb_ = np.repeat(a, len(b)), np.tile(b, len(a))
                out.append(pd.DataFrame({
                    "doc_a": np.minimum(pa_, pb_),
                    "doc_b": np.maximum(pa_, pb_),
                    "hamming": np.full(len(pa_), int(h), dtype=np.int64)}))
        if not out:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        return pd.concat(out, ignore_index=True)

    exploded = sigs.map_batches(explode, batch_format="pandas")
    cand = bucketed_map_groups(exploded, ["band_key"], bucket_pairs,
                               n_buckets=16)
    # a pair can collide in up to 4 bands → distinct
    return grouped_distinct(cand, ["doc_a", "doc_b", "hamming"],
                            n_buckets=16)
