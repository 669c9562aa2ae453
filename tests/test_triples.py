"""Triple builders — golden counts mirroring the reference's unit tests
(tests/unit/test_spreadsheet_loader.py:81-93: 2 parts → 6 triples; +1 edge →
7; metadata-bearing part → up to 9, spreadsheet_loader.py:878-917)."""

import pandas as pd

from xlsx_to_graphdb_ray.stages import triples as T


def _entity_row(cid, name, **attrs):
    base = {"canon_id": cid, "prov": "c1:000000", "name": name,
            "part_type": None, "view": None, "state": None,
            "source": None, "revision": None, "container": None}
    base.update(attrs)
    return base


def test_bare_entity_three_triples():
    b = pd.DataFrame([_entity_row("P1", "alpha"),
                      _entity_row("P2", "beta")])
    out = T.entity_triples_batch(b)
    assert len(out) == 6  # rdf:type + ont:name + rdfs:label each


def test_full_metadata_entity_nine_triples():
    b = pd.DataFrame([_entity_row(
        "P1", "alpha", part_type="MechanicalPart", view="Design",
        state="RELEASED", source="make", revision="A", container="CONT1")])
    out = T.entity_triples_batch(b)
    assert len(out) == 9
    preds = set(out["pred"])
    assert T.ONT + "hasPartType" in preds
    assert out[out["pred"] == T.ONT + "hasPartType"]["obj"].iloc[0] \
        == T.ONT + "MechanicalPart"
    # literals vs URIs (ref: revision/container are Literals, :908-916)
    lits = dict(zip(out["pred"], out["obj_lit"]))
    assert lits[T.ONT + "hasRevision"] is True or lits[T.ONT + "hasRevision"]
    assert not lits[T.ONT + "hasState"]


def test_name_falls_back_to_id():
    out = T.entity_triples_batch(pd.DataFrame([_entity_row("P1", None)]))
    name_row = out[out["pred"] == T.ONT + "name"]
    assert name_row["obj"].iloc[0] == "P1"


def test_relation_triples_and_reverse_used_in():
    b = pd.DataFrame({
        "pred": ["hasComponent", "hasAlternate"],
        "a_canon": ["P1", "P3"],
        "b_canon": ["P2", "P4"],
        "prov": ["c1:000001", "c1:000002"],
    })
    out = T.relation_triples_batch(b)
    assert len(out) == 3  # 2 direct + 1 usedIn reverse of the component edge
    used_in = out[out["pred"] == T.ONT + "usedIn"]
    assert used_in["subj"].iloc[0] == "urn:entity:P2"
    assert used_in["obj"].iloc[0] == "urn:entity:P1"


def test_dedup_first_wins(ray_session):
    import ray.data

    dup = pd.DataFrame({
        "subj": ["s"] * 3 + ["t"],
        "pred": ["p"] * 3 + ["p"],
        "obj": ["o"] * 3 + ["o"],
        "obj_lit": [False] * 4,
        "prov": ["c2:000005", "c1:000009", "c1:000002", "c9:000001"],
    })
    out = T.dedup_first_wins(ray.data.from_pandas(dup)).to_pandas()
    assert len(out) == 2
    got = dict(zip(out["subj"], out["prov"]))
    assert got["s"] == "c1:000002"  # min provenance wins deterministically
    assert got["t"] == "c9:000001"
