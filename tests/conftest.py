"""Shared pytest fixtures: one SparkSession per test session."""

from __future__ import annotations

import pytest

from ai_ready_data_framework_spark import registry
from ai_ready_data_framework_spark.session import get_spark

registry.load_all()

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="ai-ready-tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correctness() -> str:
    return SF_CORRECTNESS
