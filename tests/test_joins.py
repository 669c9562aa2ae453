"""Bucketed hash join primitive (portable Dataset join, SURVEY.md §2.5)."""

import pandas as pd
import pytest
import ray.data


from xlsx_to_graphdb_ray.stages.joins import hash_join

L = pd.DataFrame({"k": ["a", "b", "c", "a"], "x": [1, 2, 3, 4]})
R = pd.DataFrame({"k": ["a", "b", "d"], "y": [10, 20, 40]})


@pytest.fixture()
def lr(ray_session):
    return ray.data.from_pandas(L), ray.data.from_pandas(R)


def test_inner(lr):
    l, r = lr
    out = hash_join(l, r, on=["k"]).to_pandas().sort_values(["k", "x"])
    assert list(zip(out["k"], out["x"], out["y"])) == [
        ("a", 1, 10), ("a", 4, 10), ("b", 2, 20)]


def test_inner_different_key_names(lr):
    l, _ = lr
    r2 = ray.data.from_pandas(R.rename(columns={"k": "kk"}))
    out = hash_join(l, r2, on=["k"], right_on=["kk"]).to_pandas()
    assert sorted(out["x"].tolist()) == [1, 2, 4]
    assert "kk" in out.columns


def test_left_anti(lr):
    l, r = lr
    out = hash_join(l, r, on=["k"], how="left_anti").to_pandas()
    assert out["k"].tolist() == ["c"] and out["x"].tolist() == [3]


def test_left_semi(lr):
    l, r = lr
    out = hash_join(l, r, on=["k"], how="left_semi").to_pandas()
    assert sorted(out["x"].tolist()) == [1, 2, 4]
    assert list(out.columns) == ["k", "x"]


def test_left(lr):
    l, r = lr
    out = hash_join(l, r, on=["k"], how="left").to_pandas()
    assert len(out) == 4
    assert out[out["k"] == "c"]["y"].isna().all()


def test_collision_suffix(ray_session):
    l = ray.data.from_pandas(pd.DataFrame({"k": ["a"], "v": [1]}))
    r = ray.data.from_pandas(pd.DataFrame({"k": ["a"], "v": [2]}))
    out = hash_join(l, r, on=["k"]).to_pandas()
    assert out["v"].tolist() == [1] and out["v_r"].tolist() == [2]


def test_prefix_pairs_broadcast_and_fallback_agree(ray_session, monkeypatch):
    """kg_prefix_pairs: the broadcast anti-join (default) and the
    distributed hash anti-join fallback must emit the identical pair set."""
    import pandas as pd

    from xlsx_to_graphdb_ray.pipelines import queries as q
    from xlsx_to_graphdb_ray.stages import closure

    sf = "/root/testdata/sf0.001"

    def norm(ds):
        return ds.to_pandas().sort_values(["id_lo", "id_hi"]) \
            .reset_index(drop=True)

    fast = norm(q.kg_prefix_pairs(sf))
    monkeypatch.setattr(closure, "DRIVER_LIMIT", 0)   # force fallback
    slow = norm(q.kg_prefix_pairs(sf))
    pd.testing.assert_frame_equal(fast, slow)
    assert len(fast) > 0
