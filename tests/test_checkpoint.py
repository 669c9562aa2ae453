"""Checkpoint / lineage-manifest semantics (resumable stage boundaries)."""

import json
import os

import pandas as pd
import ray.data

from xlsx_to_graphdb_ray.state.checkpoint import (
    MANIFEST,
    checkpoint_dataset,
    file_fingerprint,
    is_valid,
)


def _df(n):
    return pd.DataFrame({"x": range(n)})


def test_checkpoint_computes_then_reuses(ray_session, tmp_path):
    ckpt = str(tmp_path / "stage1")
    calls = []

    def make():
        calls.append(1)
        return ray.data.from_pandas(_df(10))

    ds1 = checkpoint_dataset(make, ckpt, "fp-A")
    assert ds1.count() == 10 and calls == [1]
    ds2 = checkpoint_dataset(make, ckpt, "fp-A")
    assert ds2.count() == 10 and calls == [1]  # resumed, not recomputed
    meta = json.load(open(os.path.join(ckpt, MANIFEST)))
    assert meta["fingerprint"] == "fp-A" and meta["rows"] == 10


def test_fingerprint_change_invalidates(ray_session, tmp_path):
    ckpt = str(tmp_path / "stage2")
    calls = []

    def make():
        calls.append(1)
        return ray.data.from_pandas(_df(3 * len(calls)))

    checkpoint_dataset(make, ckpt, "fp-A").count()
    out = checkpoint_dataset(make, ckpt, "fp-B")  # input changed
    assert out.count() == 6 and calls == [1, 1]
    assert is_valid(ckpt, "fp-B") and not is_valid(ckpt, "fp-A")


def test_corrupt_manifest_recomputes(ray_session, tmp_path):
    ckpt = str(tmp_path / "stage3")
    calls = []

    def make():
        calls.append(1)
        return ray.data.from_pandas(_df(5))

    checkpoint_dataset(make, ckpt, "fp").count()
    with open(os.path.join(ckpt, MANIFEST), "w") as f:
        f.write("{not json")
    checkpoint_dataset(make, ckpt, "fp").count()
    assert calls == [1, 1]


def test_file_fingerprint_tracks_mtime_and_size(tmp_path):
    p = tmp_path / "a.parquet"
    p.write_bytes(b"xx")
    f1 = file_fingerprint(str(p))
    p.write_bytes(b"xxxx")
    os.utime(p, (1, 1))
    f2 = file_fingerprint(str(p))
    assert f1 != f2
