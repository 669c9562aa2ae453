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


# ---------------------------------------------------------------------------
# K6 load-script generator (ref scripts/generate_load_script.py:9-37)
# ---------------------------------------------------------------------------

def _fake_curl(tmp_path):
    """A PATH-front curl stub that logs every invocation and succeeds —
    lets the generated loader run end-to-end with no network."""
    import os
    bindir = tmp_path / "bin"
    bindir.mkdir(exist_ok=True)
    log = tmp_path / "curl.log"
    stub = bindir / "curl"
    stub.write_text(
        "#!/bin/bash\n"
        # record the line count of any --data-binary @file payload so the
        # test can assert the per-POST triple cap
        "n=''\n"
        "for a in \"$@\"; do\n"
        "  case $a in @*) n=$(wc -l < \"${a#@}\");; esac\n"
        "done\n"
        f'echo "$n|$@" >> {log}\n'
    )
    os.chmod(stub, 0o755)
    env = dict(os.environ, PATH=f"{bindir}:{os.environ['PATH']}")
    return env, log


def test_load_script_generation_and_resume(ray_session, tmp_path):
    import os
    import subprocess

    from xlsx_to_graphdb_ray.sinks.load_script import generate_load_script

    out = str(tmp_path / "nt")
    ds = ray.data.from_pandas(pd.DataFrame({
        "subj": [f"urn:e:{i}" for i in range(50)],
        "pred": ["urn:p"] * 50,
        "obj": [f"v{i}" for i in range(50)],
        "obj_lit": [True] * 50})).repartition(4)
    write_ntriples(ds, out)
    parts = sorted(f for f in os.listdir(out) if f.endswith(".nt"))
    assert parts

    script_path = str(tmp_path / "load.sh")
    text = generate_load_script(out, "http://db:7200", "kg",
                                batch_triples=7, out_path=script_path)
    # every part is referenced; preflight probe present; syntax-valid
    for p in parts:
        assert p in text
    assert "/repositories/kg/size" in text or '"$ENDPOINT/repositories/$REPO/size"' in text
    subprocess.run(["bash", "-n", script_path], check=True)

    env, log = _fake_curl(tmp_path)
    r = subprocess.run(["bash", script_path], env=env,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    calls = log.read_text().splitlines()
    posts = [c for c in calls if "--data-binary" in c]
    # batch=7 over 50 triples across 4 parts -> ceil per part, >= 8 POSTs
    assert len(posts) >= 8
    # no posted chunk may exceed the 7-triple cap, and all 50 arrive
    sizes = [int(c.split("|", 1)[0]) for c in posts]
    assert max(sizes) <= 7 and sum(sizes) == 50
    done = os.listdir(os.path.join(out, "_loaded"))
    assert sorted(done) == [p + ".done" for p in parts]

    # rerun: markers make it a no-op (resumable-output contract)
    log.write_text("")
    r2 = subprocess.run(["bash", script_path], env=env,
                        capture_output=True, text=True)
    assert r2.returncode == 0
    posts2 = [c for c in log.read_text().splitlines() if "--data-binary" in c]
    assert posts2 == []
    assert "skip (done)" in r2.stdout


def test_load_script_validates_batch_and_empty_dir(tmp_path):
    import pytest

    from xlsx_to_graphdb_ray.functions.validation import ValidationError
    from xlsx_to_graphdb_ray.sinks.load_script import generate_load_script

    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="no .nt part"):
        generate_load_script(str(empty))
    (empty / "a.nt").write_text("<urn:a> <urn:p> <urn:b> .\n")
    with pytest.raises(ValidationError):
        generate_load_script(str(empty), batch_triples=0)
    with pytest.raises(ValidationError):
        generate_load_script(str(empty), batch_triples=10001)
