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


def test_minhash_dispatch_tiers_agree(docs, monkeypatch):
    """All three dispatch tiers (driver-group / exchange+driver-verify /
    full hash-join) must produce identical pairs."""
    key = ["doc_a", "doc_b"]

    def run():
        return dedup_docs.minhash_lsh_pairs(docs).to_pandas() \
            .sort_values(key).reset_index(drop=True)

    tier_a = run()                                     # band rows on driver
    monkeypatch.setattr(dedup_docs, "BAND_DRIVER_LIMIT", 1)
    tier_b = run()                                     # exchange, pairs on driver
    monkeypatch.setattr(dedup_docs, "PAIR_DRIVER_LIMIT", 1)
    tier_c = run()                                     # fully distributed joins
    pd.testing.assert_frame_equal(tier_a, tier_b, check_like=True)
    pd.testing.assert_frame_equal(tier_a, tier_c, check_like=True)


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


def test_embedding_near_dup_dispatch_tiers_agree(ray_session, monkeypatch):
    """All four vec dispatch tiers (driver / exchange / emb-guard reroute /
    fused bucket verify) must produce identical pairs. The bucket-verify
    tier verifies inside the co-located band buckets so pairwise payload
    never materializes (the first hash-join design shipped candidate x
    512-byte embedding rows and filled the disk at the sf6 exercise),
    and ships embeddings as fixed-width bytes — a tensor column in an
    empty shuffle partition degrades to Arrow `null` and breaks the
    shuffle finalize concat."""
    vecs = ray.data.read_parquet(synth.ensure_synth(SF)["vecs"])
    key = ["vec_a", "vec_b"]

    def run():
        return ann.cosine_near_dup_pairs(vecs).to_pandas() \
            .sort_values(key).reset_index(drop=True)

    tier_a = run()
    assert ann.LAST_VEC_TIER == "driver" and len(tier_a)
    monkeypatch.setattr(dedup_docs, "BAND_DRIVER_LIMIT", 1)
    tier_b = run()
    assert ann.LAST_VEC_TIER == "exchange"
    monkeypatch.setattr(ann, "EMB_DRIVER_LIMIT", 0)
    tier_c = run()
    assert ann.LAST_VEC_TIER == "bucket-verify-emb-guard"
    monkeypatch.setattr(dedup_docs, "PAIR_DRIVER_LIMIT", 1)
    tier_d = run()
    assert ann.LAST_VEC_TIER == "bucket-verify"
    for other in (tier_b, tier_c, tier_d):
        pd.testing.assert_frame_equal(tier_a, other, check_like=True)


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


def test_simhash_pairs_find_planted_exact_dups(docs):
    """Exact-duplicate docs have identical simhash → hamming 0; the banded
    LSH must surface every one of them (it is exact for hamming<=3)."""
    pairs = dedup_docs.simhash_pairs(docs).to_pandas()
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    n = synth.make_docs(0.001).num_rows
    planted_exact = {(k - 1, k) for k in range(n) if k % 10 == 7}
    assert planted_exact <= got
    zero = pairs[pairs["hamming"] == 0]
    assert planted_exact <= set(zip(zero["doc_a"], zero["doc_b"]))
    assert (pairs["hamming"] <= 3).all()
    assert (pairs["doc_a"] < pairs["doc_b"]).all()


def test_simhash_pairs_dup_family_larger_than_cap(ray_session):
    """An identical-text family BIGGER than the per-bucket cap must still
    emit every within-family pair: identical-signature runs are exempt
    from the compare cap (they need no popcount compares), so exactness
    survives duplicate families of any size (round-3 advisor finding)."""
    import pandas as pd
    import ray.data

    fam = 24
    rows = [{"doc_id": i, "text": "the exact same document text " * 3}
            for i in range(fam)]
    rows += [{"doc_id": 100 + i, "text": f"unique filler document {i} "
              f"with distinct words {i * 7} and {i * 13}"}
             for i in range(10)]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    pairs = dedup_docs.simhash_pairs(ds, max_group=4).to_pandas()
    fam_pairs = pairs[(pairs["doc_a"] < fam) & (pairs["doc_b"] < fam)]
    got = set(zip(fam_pairs["doc_a"], fam_pairs["doc_b"]))
    want = {(i, j) for i in range(fam) for j in range(i + 1, fam)}
    assert got >= want
    assert (fam_pairs["hamming"] == 0).all()
    # and no pair is emitted twice (band-0-only emission for runs)
    assert not pairs.duplicated(["doc_a", "doc_b"]).any()


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        multimodal.DecodeStub(fake=False)


def test_png_encode_decode_roundtrip_all_filters():
    """The REAL decoder must invert the encoder bit-for-bit for every PNG
    scanline filter type and color type (gray/RGB/RGBA)."""
    rng = np.random.default_rng(5)
    for ctype, ch in [(0, 1), (2, 3), (6, 4)]:
        for ftype in range(5):
            pix = rng.integers(0, 256, size=(9, 7, ch), dtype=np.uint8)
            blob = synth.png_encode(pix, ctype, filter_type=ftype)
            got = multimodal.decode_png(bytes(blob))
            assert got.shape == pix.shape, (ctype, ftype)
            assert (got == pix).all(), (ctype, ftype)


def test_decode_wav_known_samples():
    # 16-bit signed LE, 2 channels
    samples = np.array([0, -1, 32767, -32768, 1000, -1000], dtype="<i2")
    blob = synth.wav_header(8000, 2, 16, samples.nbytes) + samples.tobytes()
    got = multimodal.decode_wav(blob)
    assert (got == samples.astype(np.int64)).all()
    # 8-bit unsigned mono
    s8 = np.array([0, 128, 255, 7], dtype=np.uint8)
    blob8 = synth.wav_header(8000, 1, 8, s8.nbytes) + s8.tobytes()
    assert (multimodal.decode_wav(blob8) == s8.astype(np.int64)).all()


def test_decode_rejects_malformed():
    with pytest.raises(ValueError):
        multimodal.decode_png(b"not a png at all, definitely")
    with pytest.raises(ValueError):
        multimodal.decode_wav(b"RIFFxxxxJUNK")
    # valid signature but truncated chunk stream
    with pytest.raises(ValueError):
        multimodal.decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8)


def test_real_decode_matches_writer_truth(ray_session):
    """Encode→decode round trip over the synth corpus: the REAL decoder's
    sums must equal the writer-truth columns the encoder recorded."""
    paths = synth.ensure_synth(SF)
    media = ray.data.read_parquet(paths["media"])
    out = multimodal.decode_and_reduce(media).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    truth = pd.read_parquet(paths["media"],
                            columns=["media_id", "pixel_sum", "n_pixels"]) \
        .sort_values("media_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, truth)


def test_decode_fake_pixel_sums(ray_session):
    media = ray.data.read_parquet(synth.ensure_synth(SF)["media"]).limit(20)
    out = multimodal.decode_and_reduce(media, fake=True).to_pandas()
    assert len(out) == 20
    assert (out["n_pixels"] >= 1).all()
    # mean of uint8 pixels must land in [0, 255]
    mean = out["pixel_sum"] / out["n_pixels"]
    assert ((mean >= 0) & (mean <= 255)).all()


def test_parse_headers_matches_writer_metadata(ray_session):
    """The struct-level parse (pure bytes) must recover exactly what the
    synth writer encoded in the PNG IHDR / WAV fmt headers."""
    paths = synth.ensure_synth(SF)
    media = ray.data.read_parquet(paths["media"])
    meta = pd.read_parquet(paths["media"],
                           columns=["media_id", "kind", "width", "height",
                                    "sample_rate"])
    out = multimodal.parse_headers(media).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    meta = meta.sort_values("media_id").reset_index(drop=True)
    assert (out["container"] == np.where(meta["kind"] == "image",
                                         "png", "wav")).all()
    assert (out["width"] == meta["width"]).all()
    assert (out["height"] == meta["height"]).all()
    assert (out["sample_rate"] == meta["sample_rate"]).all()
    imgs = out[out["container"] == "png"]
    wavs = out[out["container"] == "wav"]
    assert set(imgs["bit_depth"]) == {8}
    assert set(imgs["channels"]) <= {1, 3, 4}
    assert set(wavs["bit_depth"]) <= {8, 16}
    assert set(wavs["channels"]) <= {1, 2}


def test_parse_headers_golden_and_malformed(ray_session):
    """Hand-built headers parse to known values; junk/truncated payloads
    come back as container='unknown' with zeroed fields, not a crash."""
    rows = [
        {"media_id": 0,
         "data": synth.png_header(640, 480, color_type=6) + b"px"},
        {"media_id": 1,
         "data": synth.wav_header(44100, 2, 16, 4) + b"samp"},
        {"media_id": 2, "data": b"\x89PNG\r\n\x1a\x00 corrupted sig"},
        {"media_id": 3, "data": b"RIFFxxxxWAVEdata"},      # truncated fmt
        {"media_id": 4, "data": b""},
    ]
    ds = ray.data.from_items(rows)
    out = multimodal.parse_headers(ds).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert out.loc[0, "container"] == "png"
    assert (out.loc[0, ["width", "height", "bit_depth", "channels"]]
            .tolist() == [640, 480, 8, 4])
    assert out.loc[1, "container"] == "wav"
    assert (out.loc[1, ["sample_rate", "channels", "bit_depth"]]
            .tolist() == [44100, 2, 16])
    assert (out.loc[2:, "container"] == "unknown").all()
    assert (out.loc[2:, ["width", "height", "bit_depth", "channels",
                         "sample_rate"]].to_numpy() == 0).all()


def test_hot_group_pair_fanout_is_capped(ray_session):
    """Blocking-join guard: an adversarial hot block (one band bucket /
    name group far larger than anything organic) must emit a BOUNDED pair
    count, not O(group²) of the raw group size."""
    from xlsx_to_graphdb_ray.stages.shuffle import bucketed_map_groups

    cap = dedup_docs.MAX_GROUP_MEMBERS
    hot_n = cap + 300                     # one hot key past the cap
    df = pd.DataFrame({"band_key": ["hot"] * hot_n + ["cold", "cold"],
                       "doc_id": list(range(hot_n)) + [9001, 9002]})
    ds = ray.data.from_pandas(df)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in g.groupby("band_key", sort=False):
            if len(grp) < 2:
                continue
            ids = sorted(grp["doc_id"])[:dedup_docs.MAX_GROUP_MEMBERS]
            out += [(ids[i], ids[j]) for i in range(len(ids))
                    for j in range(i + 1, len(ids))]
        return pd.DataFrame(out, columns=["doc_a", "doc_b"])

    pairs = bucketed_map_groups(ds, ["band_key"], bucket_pairs).to_pandas()
    # hot group bounded at cap*(cap-1)/2 (not hot_n*(hot_n-1)/2), cold intact
    assert len(pairs) == cap * (cap - 1) // 2 + 1
    assert (9001, 9002) in set(zip(pairs["doc_a"], pairs["doc_b"]))


def test_ivf_recall_with_id_correlated_clusters(ray_session):
    """IVF training-sample hardening: ids are assigned IN CLUSTER ORDER
    (id ranges == clusters), the failure mode for a first-N-ids sample —
    the hash-filtered sample must still cover all clusters and keep
    recall ≥ 0.9 vs brute force."""
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(8, 32)) * 4
    rows = []
    vid = 0
    for c in centers:                     # ids strictly ordered by cluster
        for _ in range(60):
            rows.append({"vec_id": vid,
                         "embedding": (c + rng.normal(scale=0.1, size=32))
                         .tolist()})
            vid += 1
    vecs = ray.data.from_items(rows)
    qids = [5, 125, 245, 365, 475]        # one query per several clusters
    exact = ann.brute_force_topk(vecs, qids).to_pandas()
    # small train_sample forces real subsampling over the 480-row corpus
    approx = ann.ivf_topk(vecs, qids, train_sample=96).to_pandas()
    hits = total = 0
    for q in qids:
        e = set(exact.loc[exact["query_id"] == q, "vec_id"])
        a = set(approx.loc[approx["query_id"] == q, "vec_id"])
        hits += len(e & a)
        total += len(e)
    assert total > 0
    assert hits / total >= 0.9, f"IVF recall {hits / total}"


def test_ivf_empty_corpus_raises(ray_session):
    vecs = ray.data.from_pandas(
        pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                      "embedding": pd.Series([], dtype="object")}))
    with pytest.raises(Exception):
        ann.ivf_topk(vecs, [0])


def test_ivf_nondense_ids(ray_session):
    """ids starting far above train_sample (the round-2 sample filter
    ``vec_id < train_sample`` would yield an EMPTY sample) must still
    train a codebook and return results."""
    rng = np.random.default_rng(13)
    rows = [{"vec_id": 1_000_000 + i,
             "embedding": rng.normal(size=16).tolist()} for i in range(50)]
    vecs = ray.data.from_items(rows)
    out = ann.ivf_topk(vecs, [1_000_000], k=5).to_pandas()
    assert len(out) == 5


def test_chunk_sequences_boundary_math(ray_session):
    """Docs of 1, 63, 64, 65, 130 tokens → exact chunk layouts."""
    from xlsx_to_graphdb_ray.stages import textstats
    sizes = [1, 63, 64, 65, 130]
    df = pd.DataFrame({"doc_id": range(len(sizes)),
                       "text": [" ".join(["w"] * s) for s in sizes]})
    out = textstats.chunk_sequences(
        ray.data.from_pandas(df)).to_pandas() \
        .sort_values(["doc_id", "seq_idx"]).reset_index(drop=True)
    expect = []
    for d, s in enumerate(sizes):
        full, rem = divmod(s, 64)
        expect += [(d, i, 64) for i in range(full)]
        if rem:
            expect.append((d, full, rem))
    assert list(map(tuple, out.to_numpy())) == expect


def test_hash_split_deterministic_and_partitioned(ray_session):
    from xlsx_to_graphdb_ray.stages import sampling
    df = pd.DataFrame({"doc_id": range(2000)})
    a = sampling.hash_split(ray.data.from_pandas(df)).to_pandas()
    b = sampling.hash_split(ray.data.from_pandas(df)).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)          # run-over-run stable
    frac = a["split"].value_counts(normalize=True)
    assert 0.75 < frac["train"] < 0.85           # ~80/10/10
    assert 0.05 < frac["val"] < 0.15
    assert 0.05 < frac["test"] < 0.15


def test_hash_sample_independent_of_split(ray_session):
    """The salted sample must not be a prefix of the split buckets."""
    from xlsx_to_graphdb_ray.stages import sampling
    df = pd.DataFrame({"doc_id": range(2000)})
    ds = ray.data.from_pandas(df)
    sample = set(sampling.hash_sample(ds).to_pandas()["doc_id"])
    split = sampling.hash_split(ds).to_pandas().set_index("doc_id")["split"]
    assert 0.02 < len(sample) / 2000 < 0.09      # ~5%
    # sampled ids should span train AND non-train (independence of draws)
    kinds = {split[i] for i in sample}
    assert "train" in kinds and len(kinds) > 1


def test_value_quantiles_exact_rank(ray_session):
    """Rank formula ceil(n*p/100) against a hand-computed tiny group."""
    from xlsx_to_graphdb_ray.stages import windows
    vals = [5.0, 1.0, 4.0, 2.0, 3.0]             # sorted: 1 2 3 4 5
    df = pd.DataFrame({"event_type": ["x"] * 5, "value": vals,
                       "event_id": range(5),
                       "user_id": [0] * 5,
                       "ts": pd.to_datetime([0] * 5, unit="s"),
                       "props": ["{}"] * 5})
    out = windows.value_quantiles(ray.data.from_pandas(df)).to_pandas() \
        .set_index("pct")["value"]
    # n=5: p50 → rank ceil(2.5)=3 → 3.0; p90 → ceil(4.5)=5 → 5.0; p99 → 5.0
    assert out[50] == 3.0 and out[90] == 5.0 and out[99] == 5.0


def test_dup_clusters_collapse_planted_families(docs):
    """k%10==7 duplicates k-1; k%10==8 near-dups k-2 — so {k-2,k-1,k}
    forms one cluster with keeper k-2 whenever both plants fire."""
    out = dedup_docs.dup_clusters(docs)
    got = dict(zip(out["doc_id"], out["keep_id"]))
    n = synth.make_docs(0.001).num_rows
    for k in range(2, n):
        if k % 10 == 7:                       # exact dup of k-1
            assert got.get(k) is not None     # k collapses somewhere
            assert got[k] < k
    # keepers are cluster minima: no keeper is itself remapped
    assert not (set(out["keep_id"]) & set(out["doc_id"]))


@pytest.fixture(scope="module")
def documents(ray_session):
    return ray.data.read_parquet(SF + "/documents.parquet")


def test_decontaminate_flags_only_contaminated_noneval(documents):
    from xlsx_to_graphdb_ray.stages import textstats
    from xlsx_to_graphdb_ray.stages.dedup_docs import shingles
    out = textstats.decontaminate(documents).to_pandas()
    df = documents.to_pandas()
    ev_sh = {s for t in df[df.doc_id % 97 == 0]["text"] for s in shingles(t)}
    expect = {}
    for _, r in df[df.doc_id % 97 != 0].iterrows():
        n = len(set(shingles(r["text"])) & ev_sh)
        if n:
            expect[r["doc_id"]] = n
    got = dict(zip(out["doc_id"], out["n_hits"]))
    assert got == expect and len(got) > 0


def test_mix_report_totals(documents):
    import os
    from xlsx_to_graphdb_ray.stages import textstats
    full = ray.data.read_parquet(SF + "/documents.parquet",
                                 columns=["source", "lang", "text"])
    out = textstats.mix_report(full).to_pandas()
    df = documents.to_pandas()
    assert out["n_docs"].sum() == len(df)
    assert out["sum_chars"].sum() == df["text"].str.len().sum()
    # every (source, lang) combination present exactly once
    assert not out.duplicated(["source", "lang"]).any()


def test_train_mix_matches_bruteforce(documents):
    import hashlib
    from xlsx_to_graphdb_ray.stages import textstats
    out = textstats.train_mix(documents).to_pandas() \
        .sort_values("text_md5").reset_index(drop=True)
    df = documents.to_pandas()
    q = textstats.quality_scores(documents).to_pandas().set_index("doc_id")
    l = textstats.lang_id(documents).to_pandas().set_index("doc_id")
    elig = df[(q.loc[df.doc_id, "quality"].values == 1)
              & (l.loc[df.doc_id, "lang_pred"].values == "en")]
    exp = elig.assign(
        text_md5=[hashlib.md5(t.encode()).hexdigest() for t in elig["text"]]) \
        .groupby("text_md5").agg(doc_id=("doc_id", "min"),
                                 n_copies=("doc_id", "size")) \
        .reset_index().sort_values("text_md5").reset_index(drop=True)
    assert 0 < len(out) < len(df)          # the filter actually filters
    pd.testing.assert_frame_equal(
        out[["text_md5", "doc_id", "n_copies"]].astype({"n_copies": "int64"}),
        exp.astype({"n_copies": "int64"}), check_like=True)


def test_vec_dup_clusters_planted(ray_session):
    vecs = ray.data.read_parquet(synth.ensure_synth(SF)["vecs"])
    out = ann.vec_dup_clusters(vecs)             # default = LSH candidates
    # keepers are cluster minima: no keeper is itself remapped
    assert not (set(out["keep_id"]) & set(out["vec_id"]))
    assert (out["keep_id"] < out["vec_id"]).all()
    # agrees with pair graph: every member appears in >=1 exact pair
    pairs = ann.exact_near_dup_pairs(vecs).to_pandas()
    in_pairs = set(pairs["vec_a"]) | set(pairs["vec_b"])
    assert set(out["vec_id"]) <= in_pairs and len(out) > 0
    # the default LSH-candidate path must reproduce the exact-grid
    # clusters on this corpus (banded candidates are numerically
    # exhaustive for near-identical planted pairs)
    exact = ann.vec_dup_clusters(vecs, method="exact")
    key = ["vec_id", "keep_id"]
    pd.testing.assert_frame_equal(
        out.sort_values(key).reset_index(drop=True),
        exact.sort_values(key).reset_index(drop=True))


def test_repetition_kernel_hand_case():
    """Hand-checkable ratios: 'a a a a b' → top token 4/5, top bigram
    'a a' 3/4, 3-grams {aaa×2, aab} → dup 1/3."""
    import pyarrow as pa

    from xlsx_to_graphdb_ray.stages.textstats import repetition_batch

    t = pa.table({"doc_id": [0, 1, 2],
                  "text": ["a a a a b", "x", "p q r s t u v w"]})
    r = repetition_batch(t).to_pandas().set_index("doc_id")
    assert r.loc[0, "top_token_ratio"] == 0.8
    assert r.loc[0, "top_bigram_ratio"] == 0.75
    assert abs(r.loc[0, "dup_3gram_ratio"] - round(1 - 2 / 3, 6)) < 1e-9
    assert r.loc[0, "repetitive"] == 1
    # single-token doc: no bigrams/3-grams, ratios zero except top token 1.0
    assert r.loc[1, "top_token_ratio"] == 1.0
    assert r.loc[1, "top_bigram_ratio"] == 0.0
    assert r.loc[1, "dup_3gram_ratio"] == 0.0
    # all-distinct long doc: nothing repeats
    assert r.loc[2, "repetitive"] == 0
    assert r.loc[2, "dup_3gram_ratio"] == 0.0


def test_pii_scrub_planted_oracle(ray_session, tmp_path):
    """Planted PII corpus: redaction + counts must match the DuckDB RE2
    oracle bit-for-bit (same engine-parity contract as docs_pii_scrub,
    but on text that actually CONTAINS PII)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xlsx_to_graphdb_ray.pipelines.oracles_shared import shared_oracles
    from xlsx_to_graphdb_ray.stages.textstats import pii_scrub

    texts = ["contact john.doe+spam@ex-ample.co.uk now",
             "id 1234567 and 987654321 ok",
             "mixed a@b.io plus 000000 tail",
             "clean text no pii",
             "short 12345 under the 6-digit floor",
             "e: x@y.z not-an-email 9999999@10000000",
             None]
    t = pa.table({"doc_id": list(range(len(texts))),
                  "lang": ["en"] * len(texts),
                  "source": ["s"] * len(texts),
                  "n_chars": [len(x or "") for x in texts],
                  "text": texts})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    got = pii_scrub(ray.data.read_parquet(str(d / "documents.parquet"))) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')")
    want = con.sql(shared_oracles(str(d))["docs_pii_scrub"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["n_email"].tolist() == want["n_email"].tolist()
    assert got["n_number"].tolist() == want["n_number"].tolist()
    assert got["clean_text"].tolist() == want["clean_text"].tolist()
    # the planted rows actually exercised the patterns
    assert got["n_email"].sum() >= 2 and got["n_number"].sum() >= 4
    assert "<EMAIL>" in got.loc[0, "clean_text"]
    assert got.loc[4, "clean_text"].count("12345") == 1   # under the floor


def test_repetition_edge_docs_match_oracle(ray_session, tmp_path):
    """Edge texts the synthetic corpus never produces (empty, null,
    single-token, two-token, all-same-token) must still match the DuckDB
    oracle bit-for-bit."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xlsx_to_graphdb_ray.pipelines.oracles_shared import shared_oracles
    from xlsx_to_graphdb_ray.stages.textstats import repetition_stats

    texts = ["", None, "solo", "two tokens", "x x x x x x",
             "a b a b a b a b", "one two three four five six seven"]
    t = pa.table({"doc_id": list(range(len(texts))),
                  "lang": ["en"] * len(texts),
                  "source": ["s"] * len(texts),
                  "n_chars": [len(x or "") for x in texts],
                  "text": texts})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))

    got = repetition_stats(ray.data.read_parquet(str(d / "documents.parquet"))) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')")
    want = con.sql(shared_oracles(str(d))["docs_repetition"]).df() \
        .sort_values("doc_id").reset_index(drop=True)
    for c in ["top_token_ratio", "top_bigram_ratio", "dup_3gram_ratio"]:
        assert np.allclose(got[c], want[c]), (c, got[c].tolist(),
                                              want[c].tolist())
    assert got["repetitive"].tolist() == want["repetitive"].tolist()
    # sanity on the planted shapes
    r = got.set_index("doc_id")
    assert r.loc[4, "top_token_ratio"] == 1.0          # all-same-token
    assert r.loc[4, "dup_3gram_ratio"] > 0.5
    assert r.loc[6, "repetitive"] == 0                 # all-distinct


def test_stratified_sample_rebalances_and_is_deterministic(ray_session,
                                                           tmp_path):
    """Skewed strata get downsampled toward the target; small strata pass
    through whole; membership is identical run-over-run."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xlsx_to_graphdb_ray.stages.sampling import stratified_sample

    rows = [("big", i) for i in range(400)] + \
           [("mid", 400 + i) for i in range(40)] + \
           [("tiny", 440 + i) for i in range(4)]
    t = pa.table({"doc_id": [r[1] for r in rows],
                  "source": [r[0] for r in rows]})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    ds = ray.data.read_parquet(str(d / "documents.parquet"))

    out1 = stratified_sample(ds, target=10).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    out2 = stratified_sample(ds, target=10).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out1, out2)          # deterministic
    sizes = out1.groupby("stratum").size()
    assert sizes.get("tiny", 0) == 4                   # under target: all kept
    # hash sampling is Bernoulli around the target — generous bounds
    assert 2 <= sizes.get("big", 0) <= 30
    assert 2 <= sizes.get("mid", 0) <= 30
    assert len(out1) < len(rows)


def test_dedup_corpus_survivors_consistent(docs):
    """Survivors = corpus minus cluster non-reps; rep flag = cluster min."""
    out = dedup_docs.dedup_corpus(docs).to_pandas()
    delta = dedup_docs.dup_clusters(docs)
    all_ids = set(docs.to_pandas()["doc_id"])
    removed = set(delta["doc_id"])
    assert set(out["doc_id"]) == all_ids - removed
    assert len(removed) > 0                    # the dedup actually dropped
    reps = set(delta["keep_id"])
    flagged = set(out.loc[out["is_cluster_rep"] == 1, "doc_id"])
    assert flagged == reps
    assert not out["doc_id"].duplicated().any()


def test_lm_score_matches_bruteforce(documents):
    from collections import Counter

    from xlsx_to_graphdb_ray.stages import textstats
    out = textstats.lm_score(documents).to_pandas().set_index("doc_id")
    df = documents.to_pandas()
    toks = {r.doc_id: r.text.split(" ") for r in df.itertuples()}
    cnt = Counter(t for ts in toks.values() for t in ts)
    total = sum(cnt.values())
    for did, ts in list(toks.items())[:100]:
        n = max(len(ts), 1)
        w = sum((cnt[t] * 1_000_000) // total for t in ts)
        r = sum(1 for t in ts if cnt[t] <= textstats.LM_RARE_MAX)
        assert out.loc[did, "mean_prob_ppm"] == w // n
        assert out.loc[did, "rare_permyriad"] == (r * 10_000) // n
    # the flag splits the corpus non-trivially at the tuned threshold
    assert 0 < out["well_modeled"].sum() < len(out)


def test_lm_score_flags_planted_rare_doc(ray_session):
    """A doc of corpus-unique junk tokens is all rare mass → filtered."""
    from xlsx_to_graphdb_ray.stages import textstats
    base = ["the cat sat on the mat and the dog ran to the cat"] * 40
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(base)]
    rows.append({"doc_id": 99, "text": "zq1 zq2 zq3 zq4 zq5 zq6"})
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = textstats.lm_score(ds).to_pandas().set_index("doc_id")
    assert out.loc[99, "rare_permyriad"] == 10_000    # 100% rare tokens
    assert out.loc[99, "well_modeled"] == 0
    assert (out.drop(index=99)["rare_permyriad"] == 0).all()


def test_shuffle_shards_rank_contract(documents):
    from xlsx_to_graphdb_ray.stages import sampling
    ids = documents.select_columns(["doc_id"])
    out = sampling.shuffle_shards(ids).to_pandas()
    df = documents.to_pandas()
    assert sorted(out["doc_id"]) == sorted(df["doc_id"])   # a permutation
    assert set(out["shard"]) <= set(range(sampling.N_SHARDS))
    for _, g in out.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))     # dense 0..n-1
    # deterministic across executions
    again = sampling.shuffle_shards(ids).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True))
    # the order is actually shuffled, not doc_id order
    g0 = out[out["shard"] == out["shard"].iloc[0]].sort_values("pos")
    assert not g0["doc_id"].is_monotonic_increasing


def test_vec_dedup_corpus_survivors_consistent(ray_session):
    vecs = ray.data.read_parquet(synth.ensure_synth(SF)["vecs"],
                                 columns=["vec_id", "embedding"])
    out = ann.vec_dedup_corpus(vecs).to_pandas()
    delta = ann.vec_dup_clusters(vecs)
    all_ids = set(vecs.to_pandas()["vec_id"])
    removed = set(delta["vec_id"])
    assert set(out["vec_id"]) == all_ids - removed
    assert len(removed) > 0
    assert set(out.loc[out["is_cluster_rep"] == 1, "vec_id"]) \
        == set(delta["keep_id"])


def test_pack_bins_contract(documents):
    from xlsx_to_graphdb_ray.stages import sampling, textstats
    out = textstats.pack_bins(documents).to_pandas()
    df = documents.to_pandas()
    nt = {r.doc_id: len(r.text.split(" ")) for r in df.itertuples()}
    # every doc's spans sum to its token count
    per_doc = out.groupby("doc_id")["n_tokens"].sum().to_dict()
    assert per_doc == nt
    # every bin is exactly full except each shard's LAST bin
    bins = out.groupby(["shard", "bin_id"])["n_tokens"].sum()
    for shard, g in bins.groupby(level=0):
        got = g.droplevel(0).sort_index()
        assert list(got.index) == list(range(len(got)))    # dense bins
        assert (got.iloc[:-1] == textstats.BIN_TOKENS).all()
        assert 0 < got.iloc[-1] <= textstats.BIN_TOKENS
    # packing follows the shuffle order: a doc's first bin is monotone
    # in its shard rank, and each shard's rank-0 doc starts bin 0
    order = sampling.shuffle_shards(
        documents.select_columns(["doc_id"])).to_pandas()
    first_bin = out.groupby("doc_id")["bin_id"].min()
    m = order.assign(first_bin=first_bin.loc[order["doc_id"]].to_numpy())
    for _, g in m.groupby("shard"):
        g = g.sort_values("pos")
        assert g["first_bin"].is_monotonic_increasing
        assert g["first_bin"].iloc[0] == 0
    # spans of one doc are consecutive bins
    for did, g in out.groupby("doc_id"):
        b = sorted(g["bin_id"])
        assert b == list(range(b[0], b[0] + len(b)))


def test_kmeans_step_matches_bruteforce(ray_session):
    vecs = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                                 columns=["vec_id", "embedding"])
    out = ann.kmeans_step(vecs)
    df = vecs.to_pandas()
    m = np.vstack(df["embedding"].to_numpy()).astype(np.float64)
    ids = df["vec_id"].to_numpy()
    seeds = np.argsort(ids)[np.isin(np.sort(ids), np.arange(16))]
    order = np.argsort(ids)
    smat = m[order][:16]                       # vec_id < 16, sorted
    sn = smat / np.linalg.norm(smat, axis=1, keepdims=True)
    vn = m / np.linalg.norm(m, axis=1, keepdims=True)
    best = np.argmax(vn @ sn.T, axis=1)
    q = np.floor((m + 1.0) * 1_000_000).astype(np.int64)
    assert out["n_members"].groupby(out["centroid_id"]).first().sum() \
        == len(df)
    got = out.set_index(["centroid_id", "dim"])["mean_q"]
    for ci in range(16):
        sel = q[best == ci]
        if not len(sel):
            continue
        exp = sel.sum(axis=0) // len(sel)
        for d in (0, 1, 31, 63):
            assert got.loc[(ci, d)] == exp[d]
    # means moved off the seeds (it's an actual update, not identity)
    seed_q = np.floor((smat + 1.0) * 1_000_000).astype(np.int64)
    moved = sum(got.loc[(ci, 0)] != seed_q[ci, 0] for ci in range(16))
    assert moved > 0


def test_kmeans_train_recovers_planted_clusters(ray_session):
    """Tight planted clusters: trained spherical k-means reaches high
    purity, never degrades the cosine objective vs the seed assignment,
    and is deterministic (quantized integer updates)."""
    rng = np.random.default_rng(11)
    k, per, dim = 8, 30, 32
    centers = rng.normal(size=(k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.arange(k * per) % k
    pts = centers[labels] + rng.normal(size=(k * per, dim)) * 0.05
    rows = [{"vec_id": i, "embedding": v.tolist(), "label": int(l)}
            for i, (v, l) in enumerate(zip(pts, labels))]
    vecs = ray.data.from_items(rows)
    ids = vecs.select_columns(["vec_id", "embedding"])
    out = ann.kmeans_train(ids, n_centroids=16, iters=5).to_pandas()
    m = out.merge(pd.DataFrame({"vec_id": np.arange(k * per),
                                "label": labels}), on="vec_id")
    purity = m.groupby("centroid_id")["label"] \
        .agg(lambda s: s.value_counts().iloc[0]).sum() / len(m)
    assert purity >= 0.95, f"kmeans purity {purity}"
    # deterministic across runs (integer-quantized updates)
    again = ann.kmeans_train(ids, n_centroids=16, iters=5).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("vec_id").reset_index(drop=True),
        again.sort_values("vec_id").reset_index(drop=True))


def test_kmeans_train_improves_objective(ray_session):
    """On the clustered shared embeddings table, the trained assignment's
    mean best-cosine (to its own cluster mean) must not be worse than the
    seed assignment's — the Lloyd guarantee, modulo 1e-6 quantization."""
    vecs = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"])
    df = vecs.to_pandas().sort_values("vec_id").reset_index(drop=True)
    emb = np.vstack(df["embedding"].to_numpy()).astype(np.float64)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)

    def objective(assign_df):
        a = assign_df.sort_values("vec_id").reset_index(drop=True)
        sims = []
        for _, g in a.groupby("centroid_id"):
            sub = emb[g["vec_id"].to_numpy()]
            c = sub.mean(axis=0)
            c /= np.linalg.norm(c)
            sims.append(sub @ c)
        return float(np.mean(np.concatenate(sims)))

    seed = ann.centroid_assign(vecs).to_pandas()
    trained = ann.kmeans_train(vecs, iters=5).to_pandas()
    assert objective(trained) >= objective(seed) - 1e-4
