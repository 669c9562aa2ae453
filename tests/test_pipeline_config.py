"""PipelineConfig / stage-registry / CLI surface (SURVEY.md §2.11)."""

import pandas as pd
import pytest

from xlsx_to_graphdb_ray.pipeline_config import (
    PipelineConfig,
    edge_label_triples,
    register_stage,
    run_pipeline,
)

SF = "/root/testdata/sf0.001"


def test_dry_run_counts(ray_session):
    stats = run_pipeline(PipelineConfig(sf_dir=SF))
    assert stats["n_triples"] > 5000


def test_edge_labels_add_five(ray_session):
    base = run_pipeline(PipelineConfig(sf_dir=SF))["n_triples"]
    with_labels = run_pipeline(
        PipelineConfig(sf_dir=SF, add_edge_labels=True))["n_triples"]
    assert with_labels == base + 5
    labels = edge_label_triples().to_pandas()
    assert len(labels) == 5 and labels["obj_lit"].all()


def test_strict_mode_raises_on_synthetic_unknowns(ray_session):
    with pytest.raises(RuntimeError, match="strict resolution"):
        run_pipeline(PipelineConfig(sf_dir=SF, strict_names=True))


def test_custom_stage_registry(ray_session):
    def only_component(ds):
        return ds.filter(expr="pred == 'urn:ontology:hasComponent'")

    register_stage("only_component", only_component)
    stats = run_pipeline(PipelineConfig(
        sf_dir=SF, extra_stages=["only_component"]))
    full = run_pipeline(PipelineConfig(sf_dir=SF))
    assert 0 < stats["n_triples"] < full["n_triples"]
