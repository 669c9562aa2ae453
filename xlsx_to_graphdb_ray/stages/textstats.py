"""Text analysis operators over a documents table (training-data pipeline).

All scoring rules are deliberately SQL-expressible so the DuckDB oracles
check them bit-for-bit: whitespace tokenization, fixed marker-word lists,
md5-based fingerprints (lexicographic min over k-gram hashes).
"""

from __future__ import annotations

import hashlib

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
    # kernel; do it via pandas sets (still C-loop over small lists)
    import numpy as np
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    out = np.fromiter((len(set(x)) for x in toks.to_pylist()),
                      dtype=np.int64, count=len(toks))
    return pa.array(out)


def quality_scores(docs_ds):
    """(doc_id, stop_ratio, mean_token_len, quality) — simple length /
    stopword heuristics; quality = 1 if 20 ≤ n_tokens ≤ 1000 and
    stop_ratio ≤ 0.5 else 0. Ratios rounded to 6 dp (oracle parity)."""

    def score(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.split(" ")
        n = toks.str.len().clip(lower=1)
        stops = toks.map(lambda ts: sum(t in STOPWORDS for t in ts))
        tok_chars = toks.map(lambda ts: sum(len(t) for t in ts))
        stop_ratio = (stops / n).round(6)
        mean_len = (tok_chars / n).round(6)
        quality = ((toks.str.len() >= 20) & (toks.str.len() <= 1000)
                   & (stop_ratio <= 0.5)).astype("int64")
        return pd.DataFrame({"doc_id": b["doc_id"],
                             "stop_ratio": stop_ratio,
                             "mean_token_len": mean_len,
                             "quality": quality})

    return docs_ds.map_batches(score, batch_format="pandas")


def lang_id(docs_ds):
    """(doc_id, lang_pred) — marker-word language ID: the language with the
    most marker hits wins; ties and zero hits → 'und'. Tie-break by
    language name (deterministic, oracle-matched)."""
    langs = sorted(LANG_MARKERS)

    def pred(b: pd.DataFrame) -> pd.DataFrame:
        toksets = b["text"].fillna("").str.split(" ").map(set)
        counts = {
            lang: toksets.map(
                lambda ts, ms=LANG_MARKERS[lang]: sum(m in ts for m in ms))
            for lang in langs
        }
        df = pd.DataFrame(counts)
        best = df.max(axis=1)
        # first language (alphabetical) achieving the max; 'und' if zero
        pick = df.eq(best, axis=0).idxmax(axis=1)
        pick[best == 0] = "und"
        return pd.DataFrame({"doc_id": b["doc_id"].values,
                             "lang_pred": pick.values})

    return docs_ds.map_batches(pred, batch_format="pandas")


def fingerprints(docs_ds, w: int = FINGERPRINT_W):
    """(doc_id, fp) — document fingerprint: the lexicographic MIN of
    md5(k-gram) over all token k-grams (winnowing-style content id; equal
    for exact duplicates, stable under token order preservation)."""

    def fp(b: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t in b["text"].fillna(""):
            toks = t.split(" ")
            grams = [" ".join(toks[i:i + w])
                     for i in range(max(1, len(toks) - w + 1))]
            out.append(min(hashlib.md5(g.encode()).hexdigest()
                           for g in grams))
        return pd.DataFrame({"doc_id": b["doc_id"].values, "fp": out})

    return docs_ds.map_batches(fp, batch_format="pandas")
