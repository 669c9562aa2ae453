"""Training-data-pipeline query wrappers (dedup / ANN / text / streams).

Each callable takes ``sf_dir`` and returns a Dataset whose columns match its
DuckDB oracle. Dedup and embedding-near-dup run over the deterministic
duplicate-bearing synthetic corpus (``synth.make_docs`` / ``make_vecs`` —
the shared testdata corpus has no duplicates to find); text stats and ANN
run over the shared ``documents`` / ``embeddings`` tables.
"""

from __future__ import annotations

import os

import ray.data

from .. import synth
from ..config import tune_context
from ..stages import (ann, dedup_docs, multimodal, sampling, textstats,
                      windows)
from ..state.checkpoint import default_blocks

ANN_QUERY_IDS = [0, 1, 2]


def _read(path: str, columns=None, rows_per_block: int = 2048):
    tune_context()
    from ..state.checkpoint import read_parquet_auto
    return read_parquet_auto(path, columns=columns,
                             rows_per_block=rows_per_block)


def _documents(sf_dir: str):
    return _read(os.path.join(sf_dir, "documents.parquet"),
                 columns=["doc_id", "text"])


def _docs_dup(sf_dir: str):
    # shingle/minhash/fingerprint stages cost ~100-200 µs of md5 per doc —
    # fan small doc tables wider than the generic 2048-row floor (256 was
    # measured fastest at sf0.1: finer splits are dispatch-bound, coarser
    # ones leave CPUs idle)
    return _read(synth.ensure_synth(sf_dir)["docs"], rows_per_block=256)


def _vecs_dup(sf_dir: str):
    # `label` is test-only ground truth — never read it in the query path
    return _read(synth.ensure_synth(sf_dir)["vecs"],
                 columns=["vec_id", "embedding"])


# --- streams (events table) -------------------------------------------------

def _events_cols(sf_dir: str, columns: list[str]):
    # per-kernel column pruning at the READ: `props` (the wide JSON string)
    # only leaves storage for props_sum, `value` only for the aggregating
    # kernels
    return _read(os.path.join(sf_dir, "events.parquet"), columns=columns)


def events_tumbling(sf_dir: str):
    return windows.tumbling_counts(
        _events_cols(sf_dir, ["ts", "event_type", "value"]))


def events_sessionize(sf_dir: str):
    return windows.sessionize(
        _events_cols(sf_dir, ["user_id", "ts", "event_id"]))


def events_next_purchase(sf_dir: str):
    return windows.next_event_join(
        _events_cols(sf_dir, ["user_id", "ts", "event_id", "event_type"]))


def events_type_transitions(sf_dir: str):
    return windows.type_transitions(
        _events_cols(sf_dir, ["user_id", "ts", "event_id", "event_type"]))


def events_props_sum(sf_dir: str):
    return windows.props_value_sum(
        _events_cols(sf_dir, ["event_type", "props"]))


def events_hopping(sf_dir: str):
    return windows.hopping_counts(
        _events_cols(sf_dir, ["ts", "event_type", "value"]))


def _events_values(sf_dir: str):
    # quantile kernels touch only (event_type, value) — prune at the READ
    # so ts/props never leave storage
    return _read(os.path.join(sf_dir, "events.parquet"),
                 columns=["event_type", "value"])


def events_value_quantiles(sf_dir: str):
    return windows.value_quantiles(_events_values(sf_dir))


def events_quantiles_sketch(sf_dir: str):
    return windows.value_quantiles_sketch(_events_values(sf_dir))


# --- dedup family (synthetic duplicate-bearing corpus) ----------------------

def docs_exact_dedup(sf_dir: str):
    return dedup_docs.exact_dedup(_docs_dup(sf_dir))


def docs_minhash_pairs(sf_dir: str):
    return dedup_docs.minhash_lsh_pairs(_docs_dup(sf_dir))


def docs_ngram_pairs(sf_dir: str):
    return dedup_docs.ngram_jaccard_pairs(_docs_dup(sf_dir))


def docs_simhash(sf_dir: str):
    return dedup_docs.simhash_docs(_docs_dup(sf_dir))


def docs_simhash_pairs(sf_dir: str):
    return dedup_docs.simhash_pairs(_docs_dup(sf_dir))


def docs_dup_clusters(sf_dir: str):
    return dedup_docs.dup_clusters(_docs_dup(sf_dir))


def docs_dedup_corpus(sf_dir: str):
    return dedup_docs.dedup_corpus(_docs_dup(sf_dir))


# --- text analysis (shared documents table) ---------------------------------

def docs_token_stats(sf_dir: str):
    return textstats.token_stats(_documents(sf_dir))


def docs_quality(sf_dir: str):
    return textstats.quality_scores(_documents(sf_dir))


def docs_lang_id(sf_dir: str):
    return textstats.lang_id(_documents(sf_dir))


def docs_fingerprint(sf_dir: str):
    return textstats.fingerprints(_documents(sf_dir))


def docs_tfidf_topk(sf_dir: str):
    return textstats.tfidf_topk(_documents(sf_dir))


def docs_chunk_seqs(sf_dir: str):
    return textstats.chunk_sequences(_documents(sf_dir))


def docs_top_bigrams(sf_dir: str):
    return textstats.top_bigrams(_documents(sf_dir))


def docs_split(sf_dir: str):
    return sampling.hash_split(_documents(sf_dir))


def docs_sample(sf_dir: str):
    return sampling.hash_sample(_documents(sf_dir))


def docs_decontaminate(sf_dir: str):
    return textstats.decontaminate(_documents(sf_dir))


def docs_mix_report(sf_dir: str):
    # needs the (source, lang) mix columns the default doc read prunes away
    return textstats.mix_report(
        _read(os.path.join(sf_dir, "documents.parquet"),
              columns=["source", "lang", "text"]))


def docs_train_mix(sf_dir: str):
    return textstats.train_mix(_documents(sf_dir))


def docs_lm_score(sf_dir: str):
    return textstats.lm_score(_documents(sf_dir))


def docs_shuffle_shards(sf_dir: str):
    # only doc_id leaves storage — the shuffle key derives from it
    return sampling.shuffle_shards(
        _read(os.path.join(sf_dir, "documents.parquet"),
              columns=["doc_id"]))


def docs_pack_bins(sf_dir: str):
    return textstats.pack_bins(_documents(sf_dir))


def docs_repetition(sf_dir: str):
    return textstats.repetition_stats(_documents(sf_dir))


def docs_pii_scrub(sf_dir: str):
    return textstats.pii_scrub(_documents(sf_dir))


def docs_stratified_sample(sf_dir: str):
    # only the id + stratum columns leave storage (no text)
    return sampling.stratified_sample(
        _read(os.path.join(sf_dir, "documents.parquet"),
              columns=["doc_id", "source"]))


# --- similarity search ------------------------------------------------------

def ann_topk(sf_dir: str):
    return ann.brute_force_topk(
        _read(os.path.join(sf_dir, "embeddings.parquet"),
              columns=["vec_id", "embedding"]),
        ANN_QUERY_IDS)


def ann_ivf_topk(sf_dir: str):
    return ann.ivf_topk(
        _read(os.path.join(sf_dir, "embeddings.parquet"),
              columns=["vec_id", "embedding"]),
        ANN_QUERY_IDS)


def vecs_kmeans_step(sf_dir: str):
    return ann.kmeans_step(
        _read(os.path.join(sf_dir, "embeddings.parquet"),
              columns=["vec_id", "embedding"]))


def vecs_kmeans_train(sf_dir: str):
    return ann.kmeans_train(
        _read(os.path.join(sf_dir, "embeddings.parquet"),
              columns=["vec_id", "embedding"]))


def vecs_centroid_assign(sf_dir: str):
    return ann.centroid_assign(
        _read(os.path.join(sf_dir, "embeddings.parquet"),
              columns=["vec_id", "embedding"]))


def vecs_near_dup_exact(sf_dir: str):
    return ann.exact_near_dup_pairs(_vecs_dup(sf_dir))


def vecs_near_dup_lsh(sf_dir: str):
    return ann.cosine_near_dup_pairs(_vecs_dup(sf_dir))


def vecs_dup_clusters(sf_dir: str):
    # method="exact" because this query is value-checked against an exact
    # O(N^2) SQL oracle: the banded-LSH candidate path has recall < 1 by
    # construction near tau, so the hash-checked contract belongs to the
    # exact grid; the LSH scale path is the *_lsh entry (rows-only).
    return ann.vec_dup_clusters(_vecs_dup(sf_dir), method="exact")


def vecs_dup_clusters_lsh(sf_dir: str):
    """Scale path (banded-LSH candidates): rows-only driver check;
    equality-vs-exact pinned by pytest on the synth corpus."""
    return ann.vec_dup_clusters(_vecs_dup(sf_dir), method="lsh")


def vecs_dedup_corpus(sf_dir: str):
    # exact-oracle contract — see vecs_dup_clusters
    return ann.vec_dedup_corpus(_vecs_dup(sf_dir), method="exact")


def vecs_dedup_corpus_lsh(sf_dir: str):
    """Scale path (banded-LSH candidates): rows-only driver check."""
    return ann.vec_dedup_corpus(_vecs_dup(sf_dir), method="lsh")


# --- multimodal plumbing (synthetic binary media) ---------------------------

def _media(sf_dir: str):
    # writer-truth columns (pixel_sum, n_pixels, …) exist for the oracles
    # only — the Ray kernels consume id + kind + raw bytes
    return _read(synth.ensure_synth(sf_dir)["media"],
                 columns=["media_id", "kind", "data"])


def mm_byte_stats(sf_dir: str):
    return multimodal.byte_stats(_media(sf_dir))


def mm_entropy(sf_dir: str):
    return multimodal.byte_entropy(_media(sf_dir))


def mm_header_meta(sf_dir: str):
    return multimodal.parse_headers(_media(sf_dir))


def mm_decoded_means(sf_dir: str):
    return multimodal.decode_and_reduce(_media(sf_dir))  # REAL decode
