"""Order-sensitive anaphora (T3 analogue) — correctness under shuffled input."""

import pandas as pd

from xlsx_to_graphdb_ray.stages.anaphora import resolve_bucket


def _ev(conv, turn, ord_, kind, a):
    return {"conv_id": conv, "turn_idx": turn, "ord": ord_, "kind": kind,
            "a": a, "b": None, "pred": None, "conv_bucket": 0}


def test_antecedent_is_latest_prior_mention():
    rows = [
        _ev("c1", 0, 0, "m", "alpha"),
        _ev("c1", 0, 1, "m", "beta"),
        _ev("c1", 1, 0, "m", "that one"),
        _ev("c1", 3, 0, "m", "gamma"),
        _ev("c1", 4, 0, "m", "that one"),
    ]
    out = resolve_bucket(pd.DataFrame(rows))
    got = out[out["kind"] == "m"].sort_values(["turn_idx", "ord"])["a"].tolist()
    assert got == ["alpha", "beta", "beta", "gamma", "gamma"]


def test_no_antecedent_stays_marker_and_chains_skip_anaphors():
    rows = [
        _ev("c1", 0, 0, "m", "that one"),     # nothing before → stays marker
        _ev("c1", 1, 0, "m", "alpha"),
        _ev("c1", 2, 0, "m", "that one"),     # → alpha
        _ev("c1", 3, 0, "m", "that one"),     # skips the turn-2 anaphor → alpha
    ]
    out = resolve_bucket(pd.DataFrame(rows))
    got = out.sort_values(["turn_idx"])["a"].tolist()
    assert got == ["that one", "alpha", "alpha", "alpha"]


def test_input_order_does_not_matter():
    rows = [
        _ev("c2", 2, 0, "m", "that one"),
        _ev("c1", 1, 0, "m", "that one"),
        _ev("c2", 0, 0, "m", "zeta"),
        _ev("c1", 0, 0, "m", "alpha"),
    ]
    out = resolve_bucket(pd.DataFrame(rows))
    got = dict(((c, t), a) for c, t, a in
               zip(out["conv_id"], out["turn_idx"], out["a"]))
    assert got[("c1", 1)] == "alpha"
    assert got[("c2", 2)] == "zeta"


def test_non_mention_rows_untouched():
    rows = [
        _ev("c1", 0, 0, "m", "alpha"),
        _ev("c1", 1, 0, "r", "x"),
        _ev("c1", 2, 0, "t", "search"),
        _ev("c1", 3, 0, "m", "that one"),
    ]
    out = resolve_bucket(pd.DataFrame(rows))
    by_kind = dict(zip(out["kind"], out["a"]))
    assert by_kind["r"] == "x" and by_kind["t"] == "search"
    assert out[out["turn_idx"] == 3]["a"].iloc[0] == "alpha"
