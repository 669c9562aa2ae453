"""Text analysis operators over a documents table (training-data pipeline).

All scoring rules are deliberately SQL-expressible so the DuckDB oracles
check them bit-for-bit: whitespace tokenization, fixed marker-word lists,
md5-based fingerprints (lexicographic min over k-gram hashes).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

STOPWORDS = ("the", "a", "and", "of", "to")
LANG_MARKERS = {
    "en": ("the", "a", "and"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "y"),
}
FINGERPRINT_W = 4


def token_stats(docs_ds):
    """(doc_id, n_tokens, n_uniq, n_chars) — whitespace token counting,
    vectorized in Arrow (split + list kernels)."""

    def stats(b: pa.Table) -> pa.Table:
        text = pc.fill_null(b["text"], "")
        toks = pc.split_pattern_regex(text, r"\s+")
        return pa.table({
            "doc_id": b["doc_id"],
            "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
            "n_uniq": _uniq_len(toks),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        })

    return docs_ds.map_batches(stats, batch_format="pyarrow")


def _uniq_len(toks: pa.ChunkedArray):
    # per-row distinct token count: list_unique isn't in pyarrow 16 as a
    # kernel — flatten once and count distinct (row, token) pairs with a
    # pandas hash groupby (no per-row Python sets)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n_rows = len(toks)
    lengths = pc.list_value_length(toks).to_numpy().astype(np.int64)
    flat = toks.flatten().to_numpy(zero_copy_only=False)
    row_idx = np.repeat(np.arange(n_rows, dtype=np.int64), lengths)
    out = np.zeros(n_rows, dtype=np.int64)
    if len(flat):
        d = pd.DataFrame({"r": row_idx, "t": flat}).drop_duplicates() \
            .groupby("r", sort=False).size()
        out[d.index.to_numpy()] = d.to_numpy()
    return pa.array(out)


def quality_batch(b: pa.Table) -> pa.Table:
    """Per-batch quality kernel (module-level so composed pipelines —
    ``training.train_mix`` — reuse it without a second scoring pass)."""
    stop_set = pa.array(STOPWORDS)
    text = pc.fill_null(b["text"], "")
    toks = pc.split_pattern(text, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    nt = pc.list_value_length(toks).to_numpy().astype(np.int64)
    n = np.maximum(nt, 1)
    # single-space split ⇒ sum(len(token)) == len(text) - (n_tokens - 1)
    tok_chars = pc.utf8_length(text).to_numpy().astype(np.int64) - (nt - 1)
    # stopword hits: one is_in over the flattened tokens, then a
    # per-row segment sum via reduceat on the list offsets
    flat = toks.flatten()
    hits = pc.is_in(flat, value_set=stop_set).to_numpy(
        zero_copy_only=False).astype(np.int64)
    # ListArray.offsets are ABSOLUTE positions into the values buffer;
    # flatten() is relative to the array's slice — rebase so the two
    # stay aligned even if this array ever carries a non-zero offset
    raw_off = toks.offsets.to_numpy().astype(np.int64)
    offsets = (raw_off - raw_off[0])[:-1]
    stops = np.add.reduceat(hits, offsets) if len(hits) else \
        np.zeros(len(nt), dtype=np.int64)
    stop_ratio = np.round(stops / n, 6)
    mean_len = np.round(tok_chars / n, 6)
    quality = ((nt >= 20) & (nt <= 1000)
               & (stop_ratio <= 0.5)).astype(np.int64)
    return pa.table({"doc_id": b["doc_id"],
                     "stop_ratio": pa.array(stop_ratio),
                     "mean_token_len": pa.array(mean_len),
                     "quality": pa.array(quality)})


def quality_scores(docs_ds):
    """(doc_id, stop_ratio, mean_token_len, quality) — simple length /
    stopword heuristics; quality = 1 if 20 ≤ n_tokens ≤ 1000 and
    stop_ratio ≤ 0.5 else 0. Ratios rounded to 6 dp (oracle parity)."""
    return docs_ds.map_batches(quality_batch, batch_format="pyarrow")


def lang_batch(b: pa.Table) -> pa.Table:
    """Per-batch language-ID kernel (module-level for pipeline reuse)."""
    langs = sorted(LANG_MARKERS)
    all_markers = sorted({m for ms in LANG_MARKERS.values() for m in ms})
    marker_set = pa.array(all_markers)
    text = pc.fill_null(b["text"], "")
    toks = pc.split_pattern(text, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n_rows = len(toks)
    # flatten once; only MARKER tokens survive the filter, so the
    # per-row distinct work below runs on a tiny fraction of the corpus
    flat = toks.flatten()
    lengths = pc.list_value_length(toks).to_numpy().astype(np.int64)
    row_idx = np.repeat(np.arange(n_rows, dtype=np.int64), lengths)
    mask = pc.is_in(flat, value_set=marker_set)
    hit_rows = row_idx[mask.to_numpy(zero_copy_only=False)]
    hit_toks = flat.filter(mask).to_pylist()
    hits = pd.DataFrame({"row": hit_rows, "tok": hit_toks}) \
        .drop_duplicates()                          # marker present = 1 hit
    counts = np.zeros((n_rows, len(langs)), dtype=np.int64)
    for li, lang in enumerate(langs):
        in_lang = hits["tok"].isin(LANG_MARKERS[lang])
        np.add.at(counts[:, li], hits.loc[in_lang, "row"].to_numpy(), 1)
    best = counts.max(axis=1)
    # first language (alphabetical) achieving the max; 'und' if zero
    pick = np.asarray(langs, dtype=object)[counts.argmax(axis=1)]
    pick[best == 0] = "und"
    return pa.table({"doc_id": b["doc_id"],
                     "lang_pred": pa.array(pick, pa.string())})


def lang_id(docs_ds):
    """(doc_id, lang_pred) — marker-word language ID: the language with the
    most marker hits wins; ties and zero hits → 'und'. Tie-break by
    language name (deterministic, oracle-matched)."""
    return docs_ds.map_batches(lang_batch, batch_format="pyarrow")


# per-gram md5s memoized per worker process (same pattern as
# dedup_docs._SHINGLE_HASH_CACHE): k-gram vocabularies repeat heavily
# across a natural-language corpus, so most grams cost a dict hit, not an
# md5. Safe without a w in the key — the gram STRING itself differs by w.
_GRAM_HASH_CACHE: dict[str, str] = {}
_GRAM_HASH_CACHE_MAX = 2_000_000


def fingerprints(docs_ds, w: int = FINGERPRINT_W):
    """(doc_id, fp) — document fingerprint: the lexicographic MIN of
    md5(k-gram) over all token k-grams (winnowing-style content id; equal
    for exact duplicates, stable under token order preservation). One md5
    per *unique* gram in the batch (np.unique + inverse scatter), memoized
    across batches per worker."""

    def fp(b: pd.DataFrame) -> pd.DataFrame:
        cache = _GRAM_HASH_CACHE
        if len(cache) > _GRAM_HASH_CACHE_MAX:
            cache.clear()
        md5 = hashlib.md5
        get = cache.get
        gram_lists = []
        for t in b["text"].fillna(""):
            toks = t.split(" ")
            gram_lists.append([" ".join(toks[i:i + w])
                               for i in range(max(1, len(toks) - w + 1))])
        flat = np.asarray([g for gl in gram_lists for g in gl], dtype=object)
        if len(flat) == 0:
            return pd.DataFrame({"doc_id": b["doc_id"].values,
                                 "fp": [""] * len(b)})
        uniq, inv = np.unique(flat, return_inverse=True)
        uhash = np.empty(len(uniq), dtype=object)
        for i, g in enumerate(uniq):
            h = get(g)
            if h is None:
                h = md5(g.encode()).hexdigest()
                cache[g] = h
            uhash[i] = h
        ghash = uhash[inv]
        counts = np.fromiter((len(gl) for gl in gram_lists), dtype=np.int64,
                             count=len(gram_lists))
        offsets = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=offsets[1:])
        mins = np.minimum.reduceat(ghash, offsets)
        return pd.DataFrame({"doc_id": b["doc_id"].values, "fp": mins})

    return docs_ds.map_batches(fp, batch_format="pandas")


SEQ_LEN = 64


def chunk_sequences(docs_ds, seq_len: int = SEQ_LEN):
    """(doc_id, seq_idx, n_tokens) — fixed-length sequence packing
    boundaries: each document's whitespace tokens split into chunks of
    ``seq_len``, the LLM-pretraining "chunk documents into training
    sequences" step (boundary metadata only; the text itself never fans
    out). Pure per-row vectorized fan-out — token counts via Arrow list
    kernels, chunk rows via np.repeat/arange offset arithmetic — so the
    operator streams with no shuffle at all."""

    def chunk(b: pa.Table) -> pa.Table:
        text = pc.fill_null(b["text"], "")
        nt = pc.list_value_length(pc.split_pattern(text, " ")) \
            .to_numpy().astype(np.int64)          # >= 1: split("") == [""]
        n_seqs = (nt + seq_len - 1) // seq_len
        total = int(n_seqs.sum())
        starts = np.zeros(len(n_seqs), dtype=np.int64)
        np.cumsum(n_seqs[:-1], out=starts[1:])
        seq_idx = np.arange(total, dtype=np.int64) - np.repeat(starts, n_seqs)
        n_tokens = np.minimum(seq_len, np.repeat(nt, n_seqs)
                              - seq_idx * seq_len)
        return pa.table({
            "doc_id": pa.array(np.repeat(
                b["doc_id"].to_numpy(), n_seqs)),
            "seq_idx": pa.array(seq_idx),
            "n_tokens": pa.array(n_tokens),
        })

    return docs_ds.map_batches(chunk, batch_format="pyarrow")


def top_bigrams(docs_ds, k: int = 20):
    """(bigram, n) — the corpus's top-k token bigrams (n-gram LM-style
    corpus statistics). Ties break by bigram text.

    Plan: per-batch bigram counts (one flatten + shifted string concat +
    value_counts — the cross-document pairs are masked out by boundary
    index arithmetic, no per-doc loop) → pre-combined grouped sum →
    per-bucket local top-k (safe: each bigram is fully aggregated in one
    bucket row) → single-block global top-k over ≤ k·n_buckets candidate
    rows. The exchange ships per-block partial counts, never raw bigrams
    per occurrence."""

    from .shuffle import grouped_agg

    def partial(t: pa.Table) -> pd.DataFrame:
        text = pc.fill_null(t["text"], "")
        toks = pc.split_pattern(text, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy().astype(np.int64)
        flat = toks.flatten().to_pandas()
        if len(flat) < 2:
            return pd.DataFrame({"bigram": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype="int64")})
        bg = flat.iloc[:-1].reset_index(drop=True).str.cat(
            flat.iloc[1:].reset_index(drop=True), sep=" ")
        valid = np.ones(len(flat) - 1, dtype=bool)
        ends = np.cumsum(lengths)[:-1]        # flat idx where a new doc starts
        valid[ends - 1] = False               # mask cross-document pairs
        vc = bg[valid].value_counts()
        return pd.DataFrame({"bigram": vc.index.astype(str),
                             "n": vc.to_numpy().astype("int64")})

    parts = docs_ds.map_batches(partial, batch_format="pyarrow")
    counts = grouped_agg(parts, ["bigram"], [("n", "n", "sum")],
                         n_buckets=16)

    def topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["n", "bigram"], ascending=[False, True],
                             kind="mergesort").head(k)

    cand = counts.map_batches(topk, batch_size=None, batch_format="pandas")
    return cand.repartition(1).map_batches(topk, batch_size=None,
                                           batch_format="pandas")


TFIDF_SCALE = 1_000_000


def tfidf_topk(docs_ds, k: int = 5):
    """Top-k distinguishing terms per document by inverse-document-
    frequency-weighted term frequency.

    The score is the integer-quantized ratio ``tf * 1_000_000 // df`` —
    rarer-in-corpus terms rank higher, like classic tf-idf, but the score
    is pure integer arithmetic, so numpy and the SQL oracle rank
    bit-identically (a float ``tf * ln(N/df)`` would hang the ordering on
    cross-engine libm ulps). Ties break by term. Returns
    (doc_id, rank, term, tf, df).

    Distributed as the classic two-pass plan with NO driver-side
    vocabulary: (1) per-doc term counts, vectorized explode inside
    ``map_batches``; (2) document frequency via the pre-combined grouped
    count (per-block partials → narrow bucket exchange); (3) tf ⋈ df by a
    bucketed hash join on term (scale-safe for vocabularies too big to
    broadcast); (4) per-doc top-k inside one more bucketed exchange.
    """
    from .joins import hash_join
    from .shuffle import bucketed_map_groups, grouped_agg

    def tf_batch(b: pd.DataFrame) -> pd.DataFrame:
        s = b.set_index("doc_id")["text"].fillna("").str.split(" ").explode()
        tf = s.groupby([s.index, s.values]).size().rename("tf").reset_index()
        tf.columns = ["doc_id", "term", "tf"]
        # pin dtypes: an empty batch would otherwise emit object/float64
        # columns that poison the unified block schema downstream
        return pd.DataFrame({"doc_id": tf["doc_id"].astype("int64"),
                             "term": tf["term"].astype(str),
                             "tf": tf["tf"].astype("int64")})

    tf = docs_ds.map_batches(tf_batch, batch_format="pandas")
    # df = number of docs containing the term: tf already has one row per
    # (doc, term), so a grouped count over term IS the document frequency
    df = grouped_agg(tf, ["term"], [("df", None, "count")], n_buckets=16)
    joined = hash_join(tf, df, on=["term"])

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(score=(g["tf"].astype("int64") * TFIDF_SCALE)
                     // g["df"].astype("int64"))
        g = g.sort_values(["doc_id", "score", "term"],
                          ascending=[True, False, True], kind="mergesort")
        g["rank"] = g.groupby("doc_id", sort=False).cumcount() + 1
        g = g[g["rank"] <= k]
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype("int64").to_numpy(),
            "rank": g["rank"].astype("int64").to_numpy(),
            "term": g["term"].to_numpy(),
            "tf": g["tf"].astype("int64").to_numpy(),
            "df": g["df"].astype("int64").to_numpy(),
        })

    return bucketed_map_groups(joined, ["doc_id"], topk, n_buckets=16)


# --- training-mix composition operators -------------------------------------

def decontaminate(docs_ds, eval_mod: int = 97):
    """Eval-set decontamination: flag corpus docs sharing ≥1 3-gram shingle
    with the held-out eval slice (``doc_id % eval_mod == 0``). Returns
    (doc_id, n_hits) for contaminated NON-eval docs, where ``n_hits`` is
    the number of distinct shared shingles.

    Scale shape: eval sets are small and bounded by construction (a
    benchmark suite, not a corpus slice, in production) — their shingle
    set is collected once from a filtered streaming pass, broadcast via
    ``ray.put``, and the corpus streams through one vectorized ``np.isin``
    + ``reduceat`` pass. No shuffle anywhere.
    """
    import ray

    from .dedup_docs import shingles

    def eval_sh(b: pd.DataFrame) -> pd.DataFrame:
        sub = b[(b["doc_id"] % eval_mod) == 0]
        return pd.DataFrame(
            {"s": sorted({s for t in sub["text"] for s in shingles(t)})})

    ev = docs_ds.map_batches(eval_sh, batch_format="pandas").to_pandas()
    ev_ref = ray.put(np.asarray(sorted(set(ev["s"])), dtype=object))

    def hits(b: pd.DataFrame) -> pd.DataFrame:
        ev_set = ray.get(ev_ref)
        sub = b[(b["doc_id"] % eval_mod) != 0]
        sh_lists = [shingles(t) for t in sub["text"]]
        counts = np.fromiter((len(x) for x in sh_lists), dtype=np.int64,
                             count=len(sh_lists))
        n_hits = np.zeros(len(sh_lists), dtype=np.int64)
        if counts.sum() > 0:
            flat = np.asarray([s for sl in sh_lists for s in sl],
                              dtype=object)
            hit = np.isin(flat, ev_set).astype(np.int64)
            nz = counts > 0
            nz_counts = counts[nz]
            offsets = np.zeros(len(nz_counts), dtype=np.int64)
            np.cumsum(nz_counts[:-1], out=offsets[1:])
            n_hits[nz] = np.add.reduceat(hit, offsets)
        keep = n_hits > 0
        return pd.DataFrame({
            "doc_id": sub["doc_id"].to_numpy()[keep].astype("int64"),
            "n_hits": n_hits[keep]})

    return docs_ds.map_batches(hits, batch_format="pandas")


def mix_report(docs_ds):
    """(source, lang, n_docs, sum_tokens, sum_chars) — the per-(source,
    language) corpus mix dashboard a data-mixing step consumes. Partial
    sums per block, tiny key cardinality → ``small_result`` coalesce,
    no all-to-all exchange."""
    from .shuffle import grouped_agg

    def partial(b: pa.Table) -> pa.Table:
        text = pc.fill_null(b["text"], "")
        toks = pc.split_pattern(text, " ")
        return pa.table({
            "source": b["source"], "lang": b["lang"],
            "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        })

    return grouped_agg(docs_ds.map_batches(partial, batch_format="pyarrow"),
                       ["source", "lang"],
                       [("n_docs", None, "count"),
                        ("sum_tokens", "n_tokens", "sum"),
                        ("sum_chars", "n_chars", "sum")], small_result=True)


def train_mix(docs_ds):
    """Composed end-to-end training-mix filter — what actually goes into a
    training run: eligibility = quality==1 AND lang_pred=='en' (kernels
    reused from ``quality_batch``/``lang_batch``, ONE streaming pass
    computes both flags), then exact first-wins dedup among the eligible.
    Returns (text_md5, doc_id, n_copies); ``doc_id`` is the kept
    representative. The only exchange is the final grouped min/count."""
    from .shuffle import grouped_agg

    def eligible(b: pa.Table) -> pd.DataFrame:
        q = quality_batch(b)["quality"].to_numpy().astype(bool)
        lp = lang_batch(b)["lang_pred"].to_numpy(zero_copy_only=False)
        keep = q & (lp == "en")
        texts = pc.fill_null(b["text"], "").to_pylist()
        ids = b["doc_id"].to_numpy()[keep].astype("int64")
        return pd.DataFrame({
            "text_md5": [hashlib.md5(t.encode("utf-8")).hexdigest()
                         for t, k in zip(texts, keep) if k],
            "doc_id": ids})

    elig = docs_ds.map_batches(eligible, batch_format="pyarrow")
    return grouped_agg(elig, ["text_md5"],
                       [("doc_id", "doc_id", "min"),
                        ("n_copies", None, "count")], n_buckets=16)


# ---------------------------------------------------------------------------
# Repetition filtering (Gopher-style) and PII scrubbing
# ---------------------------------------------------------------------------

REP_TOP_TOKEN_MAX = 0.15   # Gopher-ish: docs dominated by one token
REP_DUP_3GRAM_MAX = 0.05   # docs with repeated 3-gram spans


def repetition_batch(b: pa.Table) -> pa.Table:
    """Per-batch repetition kernel: top-token ratio, top-bigram ratio and
    duplicate-3-gram ratio per document (the Gopher repetition-removal
    rules re-expressed over whitespace tokens). No shuffle — pure per-doc
    stats; the grouped work is a pandas hash groupby over the flattened
    (row, gram) pairs of ONE batch, never the corpus."""
    text = pc.fill_null(b["text"], "")
    toks = pc.split_pattern(text, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lengths = pc.list_value_length(toks).to_numpy().astype(np.int64)
    n_rows = len(lengths)
    flat = toks.flatten().to_numpy(zero_copy_only=False)
    row_idx = np.repeat(np.arange(n_rows, dtype=np.int64), lengths)

    def top_count(rows: np.ndarray, grams: np.ndarray) -> np.ndarray:
        """max occurrence count of any gram per row (0 where absent)."""
        out = np.zeros(n_rows, dtype=np.int64)
        if len(rows):
            c = pd.DataFrame({"r": rows, "g": grams}) \
                .groupby(["r", "g"], sort=False).size()
            m = c.groupby(level=0).max()
            out[m.index.to_numpy()] = m.to_numpy()
        return out

    def distinct_count(rows: np.ndarray, grams: np.ndarray) -> np.ndarray:
        out = np.zeros(n_rows, dtype=np.int64)
        if len(rows):
            d = pd.DataFrame({"r": rows, "g": grams}).drop_duplicates() \
                .groupby("r", sort=False).size()
            out[d.index.to_numpy()] = d.to_numpy()
        return out

    # unigrams
    top_tok = top_count(row_idx, flat)
    n1 = np.maximum(lengths, 1)

    # bigrams / trigrams: adjacent positions whose row doesn't change
    same1 = row_idx[:-1] == row_idx[1:] if len(flat) > 1 else \
        np.zeros(0, dtype=bool)
    bg = (pd.Series(flat[:-1]) + " " + pd.Series(flat[1:])).to_numpy() \
        if len(flat) > 1 else np.zeros(0, dtype=object)
    top_bg = top_count(row_idx[:-1][same1], bg[same1])
    n2 = np.maximum(lengths - 1, 1)

    same2 = same1[:-1] & same1[1:] if len(flat) > 2 else \
        np.zeros(0, dtype=bool)
    tg = (pd.Series(bg[:-1]) + " " + pd.Series(flat[2:])).to_numpy() \
        if len(flat) > 2 else np.zeros(0, dtype=object)
    rows3 = row_idx[:-2][same2] if len(flat) > 2 else np.zeros(0, np.int64)
    d3 = distinct_count(rows3, tg[same2] if len(flat) > 2 else tg)
    n3_real = np.maximum(lengths - 2, 0)
    n3 = np.maximum(n3_real, 1)

    top_token_ratio = np.round(top_tok / n1, 6)
    top_bigram_ratio = np.round(top_bg / n2, 6)
    dup_3gram_ratio = np.round(
        np.where(n3_real > 0, 1.0 - d3 / n3, 0.0), 6)
    repetitive = ((top_token_ratio > REP_TOP_TOKEN_MAX)
                  | (dup_3gram_ratio > REP_DUP_3GRAM_MAX)).astype(np.int64)
    return pa.table({"doc_id": b["doc_id"],
                     "top_token_ratio": pa.array(top_token_ratio),
                     "top_bigram_ratio": pa.array(top_bigram_ratio),
                     "dup_3gram_ratio": pa.array(dup_3gram_ratio),
                     "repetitive": pa.array(repetitive)})


def repetition_stats(docs_ds):
    """(doc_id, top_token_ratio, top_bigram_ratio, dup_3gram_ratio,
    repetitive) — Gopher-style repetition-removal signals. ``repetitive=1``
    when one token dominates (> REP_TOP_TOKEN_MAX of tokens) or the
    3-grams are mostly duplicates (> REP_DUP_3GRAM_MAX repeats)."""
    return docs_ds.map_batches(repetition_batch, batch_format="pyarrow")


BIN_TOKENS = 256


def pack_bins(docs_ds, bin_tokens: int = BIN_TOKENS):
    """(shard, bin_id, doc_id, n_tokens) — GPT-style sequence packing:
    documents are concatenated in the deterministic shuffled training
    order (``sampling.shuffle_shards``: md5-keyed shard + in-shard rank)
    and the token stream is cut into fixed ``bin_tokens`` bins, documents
    splitting across bin boundaries. One output row per (document, bin it
    spans) — the attention-span map a packed-pretraining dataloader
    consumes (every bin is exactly full except each shard's last).

    Scale shape: shard/key assignment and token counts are pure per-row
    kernels; the only exchange is ONE bucketed co-location by shard.
    In-shard prefix sums and the span fan-out are vectorized (cumsum +
    repeat/arange offset math, the ``chunk_sequences`` pattern) — no
    global sort, no driver state. Shards are independent training
    streams, so prefix sums never cross the exchange."""
    from .sampling import N_SHARDS, SHUFFLE_SALT
    from .shuffle import bucketed_map_groups

    def keyed(b: pa.Table) -> pd.DataFrame:
        text = pc.fill_null(b["text"], "")
        nt = pc.list_value_length(pc.split_pattern(text, " ")) \
            .to_numpy().astype(np.int64)          # >= 1: split("") == [""]
        ids = b["doc_id"].to_numpy().astype(np.int64)
        md5 = hashlib.md5
        enc = SHUFFLE_SALT.encode()
        keys = np.asarray([md5(enc + str(i).encode()).hexdigest()
                           for i in ids], dtype=object)
        h = np.fromiter((int(k[:8], 16) for k in keys), dtype=np.int64,
                        count=len(keys))
        return pd.DataFrame({"doc_id": ids, "k": keys,
                             "shard": h % N_SHARDS, "nt": nt})

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["shard", "k", "doc_id"], kind="mergesort")
        nt = g["nt"].to_numpy()
        start = g.groupby("shard", sort=False)["nt"].cumsum().to_numpy() - nt
        n_spans, bin_id, tok = _pack_spans(start, nt, bin_tokens)
        return pd.DataFrame({
            "shard": np.repeat(g["shard"].to_numpy(), n_spans),
            "bin_id": bin_id,
            "doc_id": np.repeat(g["doc_id"].to_numpy(), n_spans),
            "n_tokens": tok})

    return bucketed_map_groups(
        docs_ds.map_batches(keyed, batch_format="pyarrow"), ["shard"], pack)


def _pack_spans(start: np.ndarray, nt: np.ndarray, bin_tokens: int):
    """Vectorized bin-span fan-out: docs occupying token range
    [start, start+nt) each emit one row per ``bin_tokens``-sized bin they
    overlap. Returns (n_spans per doc, bin_id per span, tokens per span).
    Pure array math — property-tested against a per-token reference."""
    first = start // bin_tokens
    last = (start + nt - 1) // bin_tokens
    n_spans = last - first + 1
    total = int(n_spans.sum())
    offs = np.zeros(len(n_spans), dtype=np.int64)
    np.cumsum(n_spans[:-1], out=offs[1:])
    span_idx = np.arange(total, dtype=np.int64) - np.repeat(offs, n_spans)
    bin_id = np.repeat(first, n_spans) + span_idx
    s = np.repeat(start, n_spans)
    e = s + np.repeat(nt, n_spans)
    tok = np.minimum(e, (bin_id + 1) * bin_tokens) \
        - np.maximum(s, bin_id * bin_tokens)
    return n_spans, bin_id, tok


LM_RARE_MAX = 2         # a token with corpus count <= this is "rare" (OOV-ish)
LM_RARE_PERMYRIAD_MAX = 3000  # docs >30% rare-token mass are ill-modeled
LM_PPM_MIN = 33300      # min mean token probability (ppm) — corpus median
LM_PPM_SCALE = 1_000_000


def lm_score(docs_ds, rare_max: int = LM_RARE_MAX,
             rare_permyriad_max: int = LM_RARE_PERMYRIAD_MAX,
             ppm_min: int = LM_PPM_MIN):
    """(doc_id, mean_prob_ppm, rare_permyriad, well_modeled) — unigram-LM
    quality scoring (the CCNet-style "score each document under a language
    model trained on the corpus" filter, with the corpus itself as the LM).

    Each token's probability is quantized to integer parts-per-million
    (``cnt * 1e6 // total_tokens``); a document's score is the tf-weighted
    mean token ppm, itself floor-quantized — every output column is pure
    integer arithmetic, so numpy and the SQL oracle agree bit-for-bit with
    no cross-engine float rounding anywhere. ``rare_permyriad`` is the
    per-myriad share of token occurrences whose corpus count is ≤
    ``rare_max`` (the OOV-mass signal real corpora filter on; the
    synthetic corpus has a dense vocabulary so it is 0 there — the planted
    pytest exercises it). ``well_modeled`` = mean_prob_ppm ≥ ppm_min AND
    rare_permyriad ≤ rare_permyriad_max.

    Distributed as the classic two-pass LM plan with NO driver vocabulary:
    (1) per-doc term counts (vectorized explode per batch); (2) corpus
    unigram counts via the pre-combined grouped sum; (3) the total-token
    scalar from a second tiny aggregate (collected once, O(1) driver
    state); (4) tf ⋈ cnt by a bucketed hash join on term (vocabularies
    outgrow broadcast at corpus scale); (5) per-doc grouped sums → final
    ratio map. Two narrow exchanges end-to-end, same shape as
    ``tfidf_topk``. (int64 headroom: cnt*1e6 overflows past ~9.2e12
    occurrences of ONE token — switch the quantizer to a pre-divided
    float or int128 past that tier.)
    """
    from .joins import hash_join
    from .shuffle import grouped_agg

    def tf_batch(b: pd.DataFrame) -> pd.DataFrame:
        s = b.set_index("doc_id")["text"].fillna("").str.split(" ").explode()
        tf = s.groupby([s.index, s.values]).size().rename("tf").reset_index()
        tf.columns = ["doc_id", "term", "tf"]
        return pd.DataFrame({"doc_id": tf["doc_id"].astype("int64"),
                             "term": tf["term"].astype(str),
                             "tf": tf["tf"].astype("int64")})

    tf = docs_ds.map_batches(tf_batch, batch_format="pandas")
    # materialize the unigram table ONCE: it is vocabulary-sized (sublinear
    # in the corpus), and both consumers below — the total-token scalar and
    # the tf ⋈ cnt join — would otherwise re-execute the whole corpus
    # tokenize pass through Ray's lineage (three passes instead of the
    # documented two)
    cnt = grouped_agg(tf, ["term"], [("cnt", "tf", "sum")],
                      n_buckets=16).materialize()
    total = int(grouped_agg(
        cnt.map_batches(lambda b: pd.DataFrame({"k": [0], "t": [
            int(b["cnt"].sum())]}), batch_format="pandas", batch_size=None),
        ["k"], [("t", "t", "sum")], small_result=True
    ).to_pandas()["t"].iloc[0]) or 1

    joined = hash_join(tf, cnt, on=["term"])

    def weights(b: pd.DataFrame) -> pd.DataFrame:
        tfv = b["tf"].astype("int64").to_numpy()
        cv = b["cnt"].astype("int64").to_numpy()
        ppm = (cv * LM_PPM_SCALE) // total
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64").to_numpy(),
            "n": tfv, "w": tfv * ppm,
            "r": np.where(cv <= rare_max, tfv, 0).astype("int64")})

    sums = grouped_agg(
        joined.map_batches(weights, batch_format="pandas"),
        ["doc_id"],
        [("n", "n", "sum"), ("w", "w", "sum"), ("r", "r", "sum")],
        n_buckets=16)

    def finish(b: pa.Table) -> pa.Table:
        n = np.maximum(b["n"].to_numpy().astype(np.int64), 1)
        mean_ppm = b["w"].to_numpy().astype(np.int64) // n
        rare = (b["r"].to_numpy().astype(np.int64) * 10_000) // n
        well = ((mean_ppm >= ppm_min) & (rare <= rare_permyriad_max)) \
            .astype(np.int64)
        return pa.table({"doc_id": b["doc_id"],
                         "mean_prob_ppm": pa.array(mean_ppm),
                         "rare_permyriad": pa.array(rare),
                         "well_modeled": pa.array(well)})

    return sums.map_batches(finish, batch_format="pyarrow")


# (name, RE2 pattern, replacement) — applied IN ORDER; counting happens on
# the text as already redacted by earlier patterns, so an email's digits
# are never double-counted as a number. RE2 on both engines (Arrow and
# DuckDB), so oracle parity is exact.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("number", r"[0-9]{6,}", "<NUM>"),
)


def pii_scrub(ds, col: str = "text", id_col: str = "doc_id"):
    """(id, n_email, n_number, clean_text) — PII redaction for training
    corpora: vectorized RE2 kernels (``count_substring_regex`` +
    ``replace_substring_regex``), zero shuffles, zero Python row loops."""

    def scrub(b: pa.Table) -> pa.Table:
        clean = pc.fill_null(b[col], "")
        cols: dict = {id_col: b[id_col]}
        for name, pat, repl in PII_PATTERNS:
            cols[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(clean, pat), pa.int64())
            clean = pc.replace_substring_regex(clean, pat, repl)
        cols["clean_text"] = clean
        return pa.table(cols)

    return ds.map_batches(scrub, batch_format="pyarrow")
