"""Property-based checks for the hand-vectorized kernels (beyond the
reference's golden-count test style, SURVEY.md §5): each vectorized
implementation is pinned to a trivially-correct per-element reference on
randomized inputs. No Ray session needed — all pure functions."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from xlsx_to_graphdb_ray.functions.normalize import norm_key, norm_key_array
from xlsx_to_graphdb_ray.sinks.ntriples import parse_ntriples, serialize_batch
from xlsx_to_graphdb_ray.stages.resolve import _resolve_series

# text without the chars the grammar reserves; printable-ish unicode
_lit = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           blacklist_characters="\x00"),
    min_size=0, max_size=60)


@settings(max_examples=200, deadline=None)
@given(st.lists(_lit, min_size=1, max_size=8))
def test_ntriples_literal_roundtrip(texts):
    import os
    import tempfile

    n = len(texts)
    t = pa.table({
        "subj": ["urn:entity:P1"] * n,
        "pred": ["urn:ontology:name"] * n,
        "obj": pa.array(texts, pa.string()),
        "obj_lit": [True] * n,
    })
    data = serialize_batch(t)
    # newline-delimited framing must survive any literal content
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.nt")
        with open(p, "wb") as f:
            f.write(data)
        back = parse_ntriples(p).to_pandas()
    assert sorted(back["obj"]) == sorted(texts)
    assert back["obj_lit"].all()


@settings(max_examples=200, deadline=None)
@given(st.one_of(_lit, st.integers(-10**6, 10**6).map(str),
                 st.floats(0, 10**6).map(lambda f: f"{f:.1f}")))
def test_norm_key_array_matches_scalar(s):
    arr = norm_key_array(pa.array([s], pa.string()))
    assert arr.to_pylist() == [norm_key(s)]


def _resolve_reference(alias, name_to_ids, id_map):
    """Per-element reference of the resolution rule (spec, not vectorized)."""
    out = []
    for a in alias:
        n = norm_key(a)
        cands = name_to_ids.get(n, [])
        if len(cands) > 1:
            out.append((None, "ambiguous", len(cands)))
        elif len(cands) == 1:
            out.append((cands[0], "resolved", 1))
        elif n in id_map:
            out.append((id_map[n], "resolved", 0))
        else:
            out.append((None, "unknown", 0))
    return out


_name = st.text(alphabet="abc 123.", min_size=1, max_size=8)


@settings(max_examples=100, deadline=None)
@given(st.lists(_name, min_size=1, max_size=30),
       st.dictionaries(_name.map(norm_key),
                       st.lists(st.sampled_from(["P1", "P2", "P3"]),
                                min_size=1, max_size=3),
                       max_size=10),
       st.dictionaries(st.sampled_from(["p1", "p2", "x9"]),
                       st.sampled_from(["P1", "P2", "X9"]), max_size=3))
def test_resolve_series_matches_reference(aliases, name_to_ids, id_map):
    eid, status, ncand = _resolve_series(
        pd.Series(aliases, dtype=object), name_to_ids, id_map)
    ref = _resolve_reference(aliases, name_to_ids, id_map)
    for i, (r_eid, r_status, r_ncand) in enumerate(ref):
        got = eid.iloc[i]
        assert (got if pd.notna(got) else None) == r_eid, (i, aliases[i])
        assert status.iloc[i] == r_status
        assert int(ncand.iloc[i]) == r_ncand


def _batch_kernel(stage_fn):
    """Capture the per-batch kernel a ``map_batches``-based stage submits,
    so it can run on a local frame without a Ray session."""
    captured = {}

    class _FakeDS:
        def map_batches(self, fn, **kw):
            captured["fn"] = fn
            return self

    stage_fn(_FakeDS())
    return captured["fn"]


def _ref_simhash(t: str) -> int:
    acc = np.zeros(64, dtype=np.int64)
    for tok in set(t.split(" ")):
        h = int(hashlib.md5(tok.encode()).hexdigest()[:16], 16)
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits == 1, 1, -1)
    bitsv = (acc >= 0).astype(np.uint64)
    return int(np.bitwise_or.reduce(
        bitsv << np.arange(64, dtype=np.uint64)).astype("int64"))


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(alphabet="ab c", min_size=0, max_size=40),
                min_size=1, max_size=12))
def test_simhash_matches_reference_loop(texts):
    from xlsx_to_graphdb_ray.stages.dedup_docs import simhash_docs

    kernel = _batch_kernel(simhash_docs)
    out = kernel(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    for i, t in enumerate(texts):
        assert int(out["simhash"].iloc[i]) == _ref_simhash(t), (i, t)


# --- round-4 kernels ---------------------------------------------------------

_tok = st.text(alphabet="ab xy", min_size=0, max_size=24)


@settings(max_examples=150, deadline=None)
@given(st.lists(_tok, min_size=1, max_size=10))
def test_repetition_kernel_matches_python_reference(texts):
    from xlsx_to_graphdb_ray.stages.textstats import repetition_batch

    t = pa.table({"doc_id": list(range(len(texts))),
                  "text": pa.array(texts, pa.string())})
    got = repetition_batch(t).to_pandas()

    for i, txt in enumerate(texts):
        toks = txt.split(" ")
        n = max(len(toks), 1)
        from collections import Counter
        top_tok = Counter(toks).most_common(1)[0][1]
        bgs = [" ".join(toks[j:j + 2]) for j in range(len(toks) - 1)]
        top_bg = Counter(bgs).most_common(1)[0][1] if bgs else 0
        tgs = [" ".join(toks[j:j + 3]) for j in range(len(toks) - 2)]
        dup3 = 1.0 - len(set(tgs)) / len(tgs) if tgs else 0.0
        r = got.iloc[i]
        assert r["top_token_ratio"] == round(top_tok / n, 6), txt
        assert r["top_bigram_ratio"] == round(top_bg / max(n - 1, 1), 6), txt
        assert r["dup_3gram_ratio"] == round(dup3, 6), txt


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(
    alphabet="aB1._%+-@ 2345679", min_size=0, max_size=40),
    min_size=1, max_size=8))
def test_pii_kernel_matches_re_reference(texts):
    import re

    import pyarrow.compute as pc

    from xlsx_to_graphdb_ray.stages.textstats import PII_PATTERNS

    clean = pa.array(texts, pa.string())
    got_counts = {}
    for name, pat, repl in PII_PATTERNS:
        got_counts[name] = pc.count_substring_regex(clean, pat).to_pylist()
        clean = pc.replace_substring_regex(clean, pat, repl)
    got_clean = clean.to_pylist()

    ref_clean, ref_counts = [], {n: [] for n, _, _ in PII_PATTERNS}
    for txt in texts:
        cur = txt
        for name, pat, repl in PII_PATTERNS:
            ref_counts[name].append(len(re.findall(pat, cur)))
            cur = re.sub(pat, repl, cur)
        ref_clean.append(cur)
    assert got_clean == ref_clean
    for name, _, _ in PII_PATTERNS:
        assert got_counts[name] == ref_counts[name]


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**9),
                min_size=1, max_size=50, unique=True),
       st.integers(min_value=1, max_value=20))
def test_stratum_rate_math(ids, target):
    """The permyriad threshold keeps exactly the ids whose hash bucket is
    under floor(target*10000/n), capped — pinned to a per-id reference."""
    import hashlib

    from xlsx_to_graphdb_ray.stages.sampling import (
        _PERMYRIAD,
        _hash_permyriad,
    )

    got = _hash_permyriad(pd.Series(ids), salt="b|")
    for i, x in enumerate(ids):
        h = int(hashlib.md5(b"b|" + str(x).encode()).hexdigest()[:8], 16) \
            % _PERMYRIAD
        assert got[i] == h
    rate = min(target * _PERMYRIAD // len(ids), _PERMYRIAD)
    kept = (got < rate).sum()
    assert 0 <= kept <= len(ids)
    if rate == _PERMYRIAD:
        assert kept == len(ids)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(1, 300), min_size=1, max_size=40),
       st.integers(2, 64))
def test_pack_spans_matches_per_token_reference(nts, bin_tokens):
    from collections import Counter

    from xlsx_to_graphdb_ray.stages.textstats import _pack_spans
    nt = np.asarray(nts, dtype=np.int64)
    start = np.cumsum(nt) - nt
    n_spans, bin_id, tok = _pack_spans(start, nt, bin_tokens)
    # per-token reference: token position p of doc d lands in bin p//B
    ref = Counter()
    for d, (s0, n0) in enumerate(zip(start, nt)):
        for p in range(s0, s0 + n0):
            ref[(d, p // bin_tokens)] += 1
    got = Counter()
    doc_of_span = np.repeat(np.arange(len(nt)), n_spans)
    for d, b, t in zip(doc_of_span, bin_id, tok):
        got[(int(d), int(b))] += int(t)
    assert got == ref
    assert (tok > 0).all()                     # no empty spans emitted
    # spans of one doc are consecutive and partition its token range
    assert (np.repeat(nt, n_spans) >= tok).all()


# ---------------------------------------------------------------------------
# AhoCorasick multi-pattern matcher (functions/multimatch.py): pinned to the
# trivially-correct per-pattern `in` check on randomized dictionaries/texts,
# including nested/overlapping patterns (the J9 prefix double-match quirk).

_pat_alpha = st.text(alphabet="abcd 0123", min_size=1, max_size=8)


@settings(max_examples=200, deadline=None)
@given(st.lists(_pat_alpha, min_size=1, max_size=25, unique=True),
       st.text(alphabet="abcd 0123", min_size=0, max_size=60))
def test_aho_corasick_matches_naive_substring(patterns, text):
    from xlsx_to_graphdb_ray.functions.multimatch import AhoCorasick

    ac = AhoCorasick(patterns)
    expected = {i for i, p in enumerate(patterns) if p in text}
    assert ac.scan(text) == expected


def test_aho_corasick_prefix_quirk():
    """A name that is a prefix of another name double-matches — the J9
    reference quirk (ingest_changes.py:121-168) the rebuild preserves."""
    from xlsx_to_graphdb_ray.functions.multimatch import AhoCorasick

    ac = AhoCorasick(["alpha rotor 3", "alpha rotor 30", "rotor 3", "100013"])
    assert ac.scan("change affecting alpha rotor 30") == {0, 1, 2}
    assert ac.scan("change affecting alpha rotor 100013") == {3}
