"""Shared pytest fixtures: one SparkSession per test session, plus the
deterministic fixture corpus (FIXTURES.md, seed 42)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from search_engine_spark.session import get_spark  # noqa: E402
from tools.gen_fixtures import write_fixture  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("search-engine-spark-tests", cores=8, shuffle_partitions=8,
                  driver_memory="8g")
    yield s


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory) -> Path:
    """sf-unit: 200-doc corpus (FIXTURES.md §1)."""
    out = tmp_path_factory.mktemp("fixtures") / "sf-unit"
    return write_fixture(out, n_docs=200, seed=42)


@pytest.fixture(scope="session")
def fixture_e2e_dir(tmp_path_factory) -> Path:
    """sf-e2e: 2000-doc corpus for end-to-end rank identity."""
    out = tmp_path_factory.mktemp("fixtures_e2e") / "sf-e2e"
    return write_fixture(out, n_docs=2000, seed=42)


@pytest.fixture(scope="session")
def fixture_expected(fixture_dir) -> dict:
    return json.loads((fixture_dir / "expected.json").read_text())


@pytest.fixture(scope="session")
def fixture_queries(fixture_dir) -> list[str]:
    return json.loads((fixture_dir / "queries.json").read_text())
