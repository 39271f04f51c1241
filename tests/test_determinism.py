"""Determinism tests for rows-only queries (SURVEY.md §5.5).

Oracle-bearing queries are re-validated against DuckDB every round;
the rows-only ones (sketches, LSH, streaming, Pandas-UDF pipelines)
are exactly the queries the driver can only count — so THEY carry the
determinism risk: wall-clock leaks, partition-order-dependent floats,
unseeded randomness. Run each twice and require identical sorted rows.
"""

from __future__ import annotations

import pytest

from ai_ready_data_framework_spark import registry

registry.load_all()

# q_assessment excluded: it measures wall-time-dependent checks
# (serving latency, throughput) by design — its *scores* for data
# checks are deterministic but timing fields legitimately vary.
ROWS_ONLY = sorted(
    (set(registry.QUERIES) - set(registry.ORACLES)) - {"q_assessment"}
)


def _null_safe_key(row: tuple) -> tuple:
    """Sort key tolerating NULLs (grouping-sets rollup levels emit
    None in the rolled-up columns): NULLs order last within a column."""
    return tuple((v is None, 0 if v is None else v) for v in row)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_is_deterministic(spark, sf_smoke, name):
    fn = registry.QUERIES[name]
    a = sorted(map(tuple, fn(spark, sf_smoke).collect()), key=_null_safe_key)
    b = sorted(map(tuple, fn(spark, sf_smoke).collect()), key=_null_safe_key)
    assert a == b, f"{name} differs across runs"
    assert a, f"{name} returned no rows at smoke SF"
