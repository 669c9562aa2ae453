"""Normalization parity with the reference's semantics.

Mirrors the reference's own tests of ``normalize_part_number``
(``tests/unit/test_enhanced_importer.py`` — float ``123.0→"123"``,
``123.5→"123.5"``, strip, NaN→"") plus the rebuild's norm_key spec.
"""

import math

import pyarrow as pa

from xlsx_to_graphdb_ray.functions.normalize import (
    norm_key,
    norm_key_array,
    normalize_number,
)


def test_normalize_number_reference_semantics():
    assert normalize_number(123.0) == "123"
    assert normalize_number(123.5) == "123.5"
    assert normalize_number(float("nan")) == ""
    assert normalize_number(None) == ""
    assert normalize_number("  AB-12 ") == "AB-12"
    assert normalize_number(7) == "7"
    assert normalize_number(math.inf) == "inf"


def test_norm_key_spec():
    assert norm_key("  Alpha Rotor 3 ") == "alpha rotor 3"
    assert norm_key("100123.0") == "100123"
    assert norm_key("100123.000") == "100123"
    assert norm_key("1.5") == "1.5"          # non-integral floats untouched
    assert norm_key("a.0") == "a.0"          # only pure-numeric collapse
    assert norm_key(None) == ""
    assert norm_key("P0000123") == "p0000123"


def test_norm_key_array_matches_scalar():
    vals = ["  Alpha ", "100123.0", None, "P0000042", "x.0", "9.50"]
    arr = norm_key_array(pa.array(vals, pa.string()))
    expected = [norm_key(v) for v in vals]
    assert arr.to_pylist() == expected


def test_norm_key_matches_duckdb_expression():
    """The Ray-side spec and the oracle-side SQL expression must agree."""
    import duckdb

    vals = ["  Alpha Rotor 3 ", "100123.0", "1.5", "a.0", "P0000123",
            " TWIN omega 9 ", "42.000"]
    sql = ("SELECT regexp_replace(lower(trim(v)), '^([0-9]+)\\.0+$', '\\1') "
           "FROM (SELECT unnest(?) AS v)")
    got = [r[0] for r in duckdb.sql(sql, params=[vals]).fetchall()]
    assert got == [norm_key(v) for v in vals]
