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


# --- zero-shuffle sorted-layout path ----------------------------------------

def _turns_df():
    """Conversations with anaphors that straddle artificial block splits."""
    rows = []
    for c in range(6):
        conv = f"c{c:02d}"
        for t in range(7):
            if t == 0:
                text = f"intro [[ent{c}a]] here"
            elif t == 3:
                text = "mid [[ent%da]] and [[that one]] again" % c
            elif t in (2, 5):
                text = "follow [[that one]] up"
            else:
                text = "plain turn no mentions"
            rows.append({"conv_id": conv, "turn_idx": t, "text": text,
                         "tool": ""})
    return pd.DataFrame(rows)


def test_sorted_path_matches_exchange_path(ray_session):
    import ray.data
    from xlsx_to_graphdb_ray.stages.anaphora import (
        extract_with_anaphora_sorted, substitute_anaphora)
    from xlsx_to_graphdb_ray.stages.extract import extract_events

    df = _turns_df()
    # 4 blocks of 10/11 rows — splits land mid-conversation on purpose
    ds = ray.data.from_pandas([df.iloc[i:i + 11].reset_index(drop=True)
                               for i in range(0, len(df), 11)])
    got = extract_with_anaphora_sorted(ds).to_pandas()
    ref = substitute_anaphora(
        ds.map_batches(extract_events, batch_format="pyarrow")).to_pandas()
    key = ["conv_id", "turn_idx", "ord", "kind", "a", "b", "pred"]
    g = got[key].sort_values(key).reset_index(drop=True).fillna("~")
    r = ref[key].sort_values(key).reset_index(drop=True).fillna("~")
    pd.testing.assert_frame_equal(g, r)
    # and the cross-block anaphors actually resolved (not left as markers)
    from xlsx_to_graphdb_ray.stages.anaphora import ANAPHOR
    m = got[got["kind"] == "m"]
    assert (m[m["turn_idx"] > 0]["a"] != ANAPHOR).all()


def test_sorted_path_raises_on_shuffled_interior_conv(ray_session):
    """Adversarial round-3 verdict case: block edge conversations are clean
    but an INTERIOR conversation has shuffled turns — must raise (the old
    edges-only check silently produced wrong antecedents here)."""
    import pytest as _pytest
    import ray.data
    from xlsx_to_graphdb_ray.stages.anaphora import (
        extract_with_anaphora_sorted, is_unsorted_layout_error)

    df = _turns_df()  # 6 convs x 7 turns, sorted
    # one block: c00..c05 in order, but c02's turns reversed (interior conv)
    mask = df["conv_id"] == "c02"
    shuffled = pd.concat([df[df["conv_id"] < "c02"],
                          df[mask].iloc[::-1],
                          df[df["conv_id"] > "c02"]]).reset_index(drop=True)
    ds = ray.data.from_pandas([shuffled])
    with _pytest.raises(Exception) as ei:
        extract_with_anaphora_sorted(ds).to_pandas()
    assert is_unsorted_layout_error(ei.value)


def test_sorted_path_raises_on_interior_conv_revisit(ray_session):
    """Interior conv appears as two separated runs in one block (each run
    internally sorted) — not contiguous, must raise."""
    import pytest as _pytest
    import ray.data
    from xlsx_to_graphdb_ray.stages.anaphora import (
        extract_with_anaphora_sorted, is_unsorted_layout_error)

    df = _turns_df()
    c02 = df[df["conv_id"] == "c02"]
    interleaved = pd.concat([
        df[df["conv_id"] == "c00"], df[df["conv_id"] == "c01"],
        c02.iloc[:3], df[df["conv_id"] == "c03"], c02.iloc[3:],
        df[df["conv_id"] == "c04"], df[df["conv_id"] == "c05"],
    ]).reset_index(drop=True)
    ds = ray.data.from_pandas([interleaved])
    with _pytest.raises(Exception) as ei:
        extract_with_anaphora_sorted(ds).to_pandas()
    assert is_unsorted_layout_error(ei.value)


def test_fused_pass_raises_on_boundary_drift():
    """A fused-pass block whose fragment starts at turn > 0 but has no
    incoming-carrier entry proves the two executions split blocks
    differently — must raise, not silently leave anaphors unresolved."""
    import pytest as _pytest
    from xlsx_to_graphdb_ray.stages.anaphora import (
        UnsortedLayoutError, _fused_extract_substitute)

    frag = pd.DataFrame({
        "conv_id": ["c00"] * 3, "turn_idx": [4, 5, 6],
        "text": ["follow [[that one]] up"] * 3, "tool": [""] * 3})
    # summary pass saw a boundary at turn 4 → entry present (None carrier ok)
    _fused_extract_substitute(frag, inc_ref={("c00", 4): None})
    # drifted boundary (entry recorded for a different tmin) → raise
    with _pytest.raises(UnsortedLayoutError, match="boundary drift"):
        _fused_extract_substitute(frag, inc_ref={("c00", 3): "alpha"})
    with _pytest.raises(UnsortedLayoutError, match="boundary drift"):
        _fused_extract_substitute(frag, inc_ref={})


def test_sorted_path_raises_on_shuffled_layout(ray_session):
    import pytest as _pytest
    import ray.data
    from xlsx_to_graphdb_ray.stages.anaphora import (
        extract_with_anaphora_sorted, is_unsorted_layout_error)

    df = _turns_df().sample(frac=1.0, random_state=3).reset_index(drop=True)
    ds = ray.data.from_pandas([df.iloc[i:i + 11].reset_index(drop=True)
                               for i in range(0, len(df), 11)])
    with _pytest.raises(Exception) as ei:
        extract_with_anaphora_sorted(ds).to_pandas()
    assert is_unsorted_layout_error(ei.value)  # kg's fallback trigger
