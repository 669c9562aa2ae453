"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from xlsx_to_graphdb_ray.config import tune_context
    tune_context()
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_small() -> str:
    return "/root/testdata/sf0.001"
