"""Driver-contract smoke tests (BASELINE.md t1)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"l_returnflag", "l_linestatus", "sum_qty", "count_order"} <= cols


def test_queries_and_oracles_align(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "no queries declared"
    # every oracle refers to a declared query
    assert set(oracles) <= set(qs)


def test_entry_deterministic(spark):
    a = entry_mod.entry(spark).collect()
    b = entry_mod.entry(spark).collect()
    assert a == b
