"""N-Triples sink: escaping, round-trip vs the Parquet sink, plugin seam."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from xlsx_to_graphdb_ray.sinks.ntriples import (
    parse_ntriples,
    serialize_batch,
    write_ntriples,
)

SF = "/root/testdata/sf0.001"


def test_serialize_escapes_tricky_literals():
    t = pa.table({
        "subj": ["urn:entity:P1"] * 4,
        "pred": ["urn:ontology:name"] * 4,
        "obj": ['say "hi"', "tab\there", "back\\nslash-n", "line\nbreak"],
        "obj_lit": [True] * 4,
        "prov": [""] * 4,
    })
    out = serialize_batch(t).decode()
    assert '"say \\"hi\\"" .' in out
    assert '"tab\\there" .' in out
    # literal backslash followed by 'n' must NOT round-trip into a newline
    assert '"back\\\\nslash-n" .' in out
    assert '"line\\nbreak" .' in out
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.nt")
        with open(p, "wb") as f:
            f.write(serialize_batch(t))
        back = parse_ntriples(p).to_pandas()
    assert sorted(back["obj"]) == sorted(t["obj"].to_pylist())
    assert back["obj_lit"].all()


def test_roundtrip_matches_parquet_sink(ray_session, tmp_path):
    from xlsx_to_graphdb_ray.pipelines import kg

    ds = kg.triples_dataset(SF)
    nt_dir = str(tmp_path / "nt")
    write_ntriples(ds, nt_dir)

    def norm(df):
        df = df[["subj", "pred", "obj", "obj_lit"]].copy()
        df["obj_lit"] = df["obj_lit"].astype(bool)
        return df.sort_values(list(df.columns), kind="mergesort") \
            .reset_index(drop=True)

    a = norm(parse_ntriples(nt_dir).to_pandas())
    b = norm(ds.to_pandas())
    assert len(a) == len(b) > 0
    pd.testing.assert_frame_equal(a, b)


def test_ntriples_as_registered_sink_stage(ray_session, tmp_path):
    """The STAGE_REGISTRY seam supports sinks: register a stage that writes
    .nt as a side effect and passes the Dataset through."""
    from xlsx_to_graphdb_ray import pipeline_config as pcfg

    out = str(tmp_path / "nt_stage")

    def nt_sink(ds):
        write_ntriples(ds, out)
        return ds

    pcfg.register_stage("nt_sink", nt_sink)
    try:
        cfg = pcfg.PipelineConfig(sf_dir=SF, extra_stages=["nt_sink"])
        stats = pcfg.run_pipeline(cfg)
        parsed = parse_ntriples(out)
        assert stats["n_triples"] == len(parsed) > 0
    finally:
        pcfg.STAGE_REGISTRY.pop("nt_sink", None)


def test_serialize_rejects_nulls():
    import pytest
    t = pa.table({
        "subj": ["urn:a", None],
        "pred": ["urn:p", "urn:p"],
        "obj": ["x", "y"],
        "obj_lit": [True, True],
    })
    with pytest.raises(ValueError, match="null"):
        serialize_batch(t)
    t2 = pa.table({
        "subj": ["urn:a"], "pred": ["urn:p"], "obj": ["x"],
        "obj_lit": pa.array([None], pa.bool_()),
    })
    with pytest.raises(ValueError, match="obj_lit"):
        serialize_batch(t2)


def test_overwrite_clears_stale_parts(ray_session, tmp_path):
    """A rerun yielding FEWER blocks must not leave stale part files mixed
    into the output (mode='overwrite' contract)."""
    import os
    out = str(tmp_path / "nt")
    big = ray.data.from_pandas(pd.DataFrame({
        "subj": [f"urn:e:{i}" for i in range(40)],
        "pred": ["urn:p"] * 40,
        "obj": [f"v{i}" for i in range(40)],
        "obj_lit": [True] * 40})).repartition(8)
    write_ntriples(big, out)
    n_parts_big = len([f for f in os.listdir(out) if f.endswith(".nt")])
    small = ray.data.from_pandas(pd.DataFrame({
        "subj": ["urn:e:0"], "pred": ["urn:p"], "obj": ["v0"],
        "obj_lit": [True]}))
    write_ntriples(small, out)                 # default mode='overwrite'
    back = parse_ntriples(out).to_pandas()
    assert len(back) == 1, "stale parts leaked into an overwrite rerun"
    import pytest
    with pytest.raises(ValueError):
        write_ntriples(small, out, mode="replace")
