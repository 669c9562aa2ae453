"""Validation-layer suite (mirrors tests/unit/test_enhanced_importer.py)."""

import pandas as pd
import pytest

from xlsx_to_graphdb_ray.functions.validation import (
    ValidationError,
    iso_to_unix,
    split_self_loops,
    split_valid_entities,
    validate_batch_size,
)


def test_batch_size_bounds():
    assert validate_batch_size(1) == 1
    assert validate_batch_size(10_000) == 10_000
    for bad in (0, -1, 10_001):
        with pytest.raises(ValidationError):
            validate_batch_size(bad)


def test_entity_split():
    df = pd.DataFrame({
        "number": ["OK-1", "", "x" * 51, "bad|char", "N1"],
        "name": ["fine", "y", "z", "w", "n" * 300],
    })
    valid, rejects = split_valid_entities(df)
    assert valid["number"].tolist() == ["OK-1"]
    reasons = dict(zip(rejects["number"], rejects["reject_reason"]))
    assert reasons[""] == "id_empty"
    assert reasons["x" * 51] == "id_too_long"
    assert reasons["bad|char"] == "id_charset"
    assert reasons["N1"] == "name_too_long"


def test_self_loop_split():
    df = pd.DataFrame({"parent": ["a", "b"], "child": ["a", "c"]})
    valid, rejects = split_self_loops(df)
    assert valid["child"].tolist() == ["c"]
    assert rejects["reject_reason"].tolist() == ["self_loop"]


def test_iso_to_unix():
    assert iso_to_unix("1970-01-01T00:00:00+00:00") == 0
    assert iso_to_unix("2025-01-01T00:00:00Z") == 1_735_689_600
    assert iso_to_unix("2025-01-01 00:00:00") == 1_735_689_600  # naive → UTC
    assert iso_to_unix("garbage") == 0
    assert iso_to_unix(None) == 0
    assert iso_to_unix("bad", default=-1) == -1
