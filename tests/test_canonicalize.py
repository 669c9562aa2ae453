"""sameAs connected components: driver union-find ≡ distributed min-label."""

import pandas as pd
import pytest
import ray.data

from xlsx_to_graphdb_ray.stages.canonicalize import (
    canonical_mapper,
    sameas_components,
)

PAIRS = [
    ("P5", "P6"), ("P6", "P7"),            # chain → canon P5
    ("P2", "P1"),                          # reversed order → canon P1
    ("P9", "P9"),                          # self pair → no-op
    ("Pb", "Pa"), ("Pb", "Pc"), ("Pa", "Pc"),  # triangle → canon Pa
]
EXPECTED = {"P6": "P5", "P7": "P5", "P2": "P1",
            "Pb": "Pa", "Pc": "Pa"}


@pytest.mark.parametrize("method", ["driver", "distributed"])
def test_components(ray_session, method):
    ds = ray.data.from_pandas(
        pd.DataFrame(PAIRS, columns=["a_id", "b_id"]))
    delta = sameas_components(ds, method=method)
    got = dict(zip(delta["entity_id"], delta["canon_id"]))
    assert got == EXPECTED


def test_mapper_identity_fallback():
    delta = pd.DataFrame({"entity_id": ["P6"], "canon_id": ["P5"]})
    m = canonical_mapper(delta)
    out = m(pd.Series(["P6", "P5", "Px"]))
    assert out.tolist() == ["P5", "P5", "Px"]


def test_empty_pairs(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"a_id": [], "b_id": []}))
    delta = sameas_components(ds, method="driver")
    assert len(delta) == 0
