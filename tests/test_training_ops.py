"""Semantic checks for the training-data operators (planted-duplicate
recovery, sketch properties) — beyond the SQL-oracle parity tests."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from xlsx_to_graphdb_ray import synth
from xlsx_to_graphdb_ray.stages import ann, dedup_docs, multimodal

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    return ray.data.read_parquet(synth.ensure_synth(SF)["docs"])


def test_exact_dedup_finds_planted_pairs(docs):
    out = dedup_docs.exact_dedup(docs).to_pandas()
    dups = out[out["n_copies"] > 1]
    # every k%10==7 doc duplicates doc k-1 → ~n/10 duplicate groups
    n = synth.make_docs(0.001).num_rows
    assert len(dups) == n // 10
    assert (dups["n_copies"] == 2).all()


def test_minhash_recovers_near_dups(docs):
    pairs = dedup_docs.minhash_lsh_pairs(docs).to_pandas()
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    n = synth.make_docs(0.001).num_rows
    planted_exact = {(k - 1, k) for k in range(n) if k % 10 == 7}
    # k%10==8 is a near copy of k-2, and k-1 is an exact copy of k-2, so
    # (k-2, k) AND (k-1, k) are both true near-dup pairs
    planted_near = {(k - 2, k) for k in range(n) if k % 10 == 8 and k >= 2} \
        | {(k - 1, k) for k in range(n) if k % 10 == 8 and k >= 2}
    # exact dups always collide in every band; near dups at J≈0.7 nearly always
    assert planted_exact <= got
    recall = len(planted_near & got) / len(planted_near)
    assert recall >= 0.8, f"minhash near-dup recall {recall}"
    # and nothing random: all reported pairs are planted
    assert got <= (planted_exact | planted_near)


def test_simhash_hamming_separates(docs):
    sims = dedup_docs.simhash_docs(docs).to_pandas() \
        .set_index("doc_id")["simhash"]
    n = synth.make_docs(0.001).num_rows
    near = [dedup_docs.hamming(int(sims[k - 2]), int(sims[k]))
            for k in range(2, n) if k % 10 == 8]
    far = [dedup_docs.hamming(int(sims[k]), int(sims[(k + 5) % n]))
           for k in range(0, n, 17) if (k + 5) % n % 10 not in (7, 8)]
    assert np.mean(near) < np.mean(far)
    assert max(near) <= 24  # near-dups stay close in Hamming space


def test_embedding_near_dup_lsh_recall(ray_session):
    vecs = ray.data.read_parquet(synth.ensure_synth(SF)["vecs"])
    exact = ann.exact_near_dup_pairs(vecs).to_pandas()
    lsh = ann.cosine_near_dup_pairs(vecs).to_pandas()
    eset = set(zip(exact["vec_a"], exact["vec_b"]))
    lset = set(zip(lsh["vec_a"], lsh["vec_b"]))
    n = synth.make_vecs(0.001).num_rows
    planted = {(k - 1, k) for k in range(1, n) if k % 10 == 9}
    assert planted <= eset                 # exact grid finds all
    assert lset <= eset                    # LSH never invents pairs
    assert len(lset & planted) / len(planted) >= 0.8  # documented recall<1


def test_ivf_topk_recall_vs_exact(ray_session):
    """IVF approximate top-k must recover ≥0.9 of the exact top-10 on the
    clustered embeddings corpus (recall<1 by design, documented)."""
    vecs = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                                 columns=["vec_id", "embedding"])
    qids = [0, 1, 2]
    exact = ann.brute_force_topk(vecs, qids).to_pandas()
    approx = ann.ivf_topk(vecs, qids).to_pandas()
    hits = total = 0
    for q in qids:
        e = set(exact.loc[exact["query_id"] == q, "vec_id"])
        a = set(approx.loc[approx["query_id"] == q, "vec_id"])
        hits += len(e & a)
        total += len(e)
    assert total > 0
    assert hits / total >= 0.9, f"IVF recall {hits / total}"


def test_lsh_adapts_to_corpus_dim(ray_session):
    # non-64-dim corpus: hyperplane dim must come from the data, not a
    # hardcode; planted near-identical pairs at dim 16 must be recovered
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append({"vec_id": 2 * i, "embedding": v.tolist()})
        rows.append({"vec_id": 2 * i + 1,
                     "embedding": (v + rng.normal(scale=1e-3, size=16))
                     .tolist()})
    vecs = ray.data.from_items(rows)
    exact = ann.exact_near_dup_pairs(vecs).to_pandas()
    lsh = ann.cosine_near_dup_pairs(vecs).to_pandas()
    planted = {(2 * i, 2 * i + 1) for i in range(40)}
    eset = set(zip(exact["vec_a"], exact["vec_b"]))
    lset = set(zip(lsh["vec_a"], lsh["vec_b"]))
    assert planted <= eset
    assert lset <= eset
    assert len(lset & planted) / len(planted) >= 0.95


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        multimodal.DecodeStub(fake=False)


def test_decode_fake_pixel_means(ray_session):
    media = ray.data.read_parquet(synth.ensure_synth(SF)["media"]).limit(20)
    out = multimodal.decode_and_reduce(media, fake=True).to_pandas()
    assert len(out) == 20
    assert ((out["pixel_mean"] >= 0) & (out["pixel_mean"] <= 255)).all()
