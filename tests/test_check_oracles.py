"""Per-check DuckDB oracles for the five single-row checks whose
graded slot is the tagged-union q_check_battery: each single query must
still match its own oracle exactly, and the battery must be exactly the
five projected rows."""

from __future__ import annotations

import pytest

from ai_ready_data_framework_spark import registry
from ai_ready_data_framework_spark.checks import queries as CQ
from ai_ready_data_framework_spark.parity import (
    compare_frames,
    duckdb_connection,
)

registry.load_all()

SINGLE_CHECK_ORACLES = {
    "q_check_fraction": CQ.ORACLE_FRACTION,
    "q_check_embedding_dim": CQ.ORACLE_EMBEDDING_DIM,
    "q_check_distribution": CQ.ORACLE_DISTRIBUTION,
    "q_check_kanon": CQ.ORACLE_KANON,
    "q_check_traceability": CQ.ORACLE_TRACEABILITY,
}


@pytest.fixture(scope="module")
def oracle_con(sf_correctness):
    return duckdb_connection(sf_correctness)


@pytest.mark.parametrize("name", sorted(SINGLE_CHECK_ORACLES))
def test_single_check_matches_oracle(spark, sf_correctness, oracle_con, name):
    spark_pdf = registry.QUERIES[name](spark, sf_correctness).toPandas()
    oracle_pdf = oracle_con.execute(SINGLE_CHECK_ORACLES[name]).df()
    result = compare_frames(name, spark_pdf, oracle_pdf)
    assert result.ok, result.detail


def test_battery_is_exactly_the_five_checks(spark, sf_correctness):
    """The union must carry one row per check with the single queries'
    own value/aux/n — no drift between the graded surface and the
    per-check operators."""
    rows = {
        r.requirement: r
        for r in registry.QUERIES["q_check_battery"](spark, sf_correctness).collect()
    }
    assert len(rows) == 5
    frac = registry.QUERIES["q_check_fraction"](spark, sf_correctness).first()
    assert rows["constraint_declaration"].value == frac.value
    assert rows["constraint_declaration"].aux is None
    assert rows["constraint_declaration"].n == frac.n_records
    kanon = registry.QUERIES["q_check_kanon"](spark, sf_correctness).first()
    assert rows["anonymization_effectiveness"].value == kanon.value
    assert rows["anonymization_effectiveness"].aux == float(kanon.min_group_size)
