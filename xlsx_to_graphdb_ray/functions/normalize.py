"""Identifier / mention normalization kernels.

Two layers:

1. ``normalize_number`` — reference-exact scalar semantics of the original
   engine's part-number normalizer (reference:
   ``src/utils/spreadsheet_loader.py:35-42`` — NaN -> "", integral float ->
   int string, else ``str``; the "enhanced" variant at
   ``src/utils/enhanced_spreadsheet_loader.py:46-73`` also strips). Used by
   the fixture-compat tabular path and its parity tests.

2. ``norm_key`` / ``norm_key_array`` — the rebuild's *dictionary key* spec for
   transcript mention resolution: ``trim -> casefold -> collapse a trailing
   ".0+" on pure-numeric strings``. This is deliberately simple enough to be
   expressed identically in DuckDB SQL for the correctness oracle:

       regexp_replace(lower(trim(x)), '^([0-9]+)\\.0+$', '\\1')

   so the Ray pipeline and the SQL oracle share one normalization spec.
"""

from __future__ import annotations

import math
import re

import pyarrow as pa
import pyarrow.compute as pc

_FLOAT_INT_RE = re.compile(r"^([0-9]+)\.0+$")
_FLOAT_INT_PATTERN = r"^([0-9]+)\.0+$"


def normalize_number(value) -> str:
    """Reference-exact part-number normalization.

    Semantics of ``normalize_part_number`` (spreadsheet_loader.py:35-42):
    NaN/None -> ""; float that is integral -> str(int(v)) (``123.0`` ->
    ``"123"``); other float -> str(v); everything else -> str(v).
    The enhanced variant additionally strips whitespace
    (enhanced_spreadsheet_loader.py:46-73); we always strip — strings from
    spreadsheets with stray whitespace are never meaningfully distinct.
    """
    if value is None:
        return ""
    if isinstance(value, float):
        if math.isnan(value):
            return ""
        if value.is_integer():
            return str(int(value))
        return str(value).strip()
    return str(value).strip()


def norm_key(value) -> str:
    """Dictionary-key normalization for mention resolution (rebuild spec).

    ``trim -> lower -> '^([0-9]+)\\.0+$' -> '\\1'``. Must stay in lockstep
    with the DuckDB expression in ``__ray_entry__.oracle_sql``.
    """
    if value is None:
        return ""
    s = str(value).strip().lower()
    return _FLOAT_INT_RE.sub(r"\1", s)


def norm_key_array(arr: pa.Array) -> pa.Array:
    """Vectorized ``norm_key`` over an Arrow string array (nulls -> "")."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    s = pc.fill_null(arr.cast(pa.string()), "")
    s = pc.utf8_trim_whitespace(s)
    s = pc.utf8_lower(s)
    return pc.replace_substring_regex(s, _FLOAT_INT_PATTERN, r"\1")


# --- URI minting -----------------------------------------------------------
# Reference mints subjects as f"urn:part:{quote(number)}" and predicates as
# "urn:ontology:<name>" (spreadsheet_loader.py:881, :921-925, :946). The
# rebuild uses the same scheme with entity/conv namespaces. Generator ids are
# URL-safe by construction, so percent-encoding is the identity on them —
# which keeps the SQL oracle a plain string concat.

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
ONT = "urn:ontology:"


def ont(name: str) -> str:
    return ONT + name


def entity_uri_array(ids: pa.Array) -> pa.Array:
    """``urn:entity:{id}`` for URL-safe ids (vectorized)."""
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pc.binary_join_element_wise(
        pa.array(["urn:entity:"] * len(ids), pa.string()), ids.cast(pa.string()), ""
    )


def conv_uri_array(conv_ids: pa.Array) -> pa.Array:
    if isinstance(conv_ids, pa.ChunkedArray):
        conv_ids = conv_ids.combine_chunks()
    return pc.binary_join_element_wise(
        pa.array(["urn:conv:"] * len(conv_ids), pa.string()),
        conv_ids.cast(pa.string()),
        "",
    )
