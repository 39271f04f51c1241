"""snapshot_diff (r9): version-to-version dataset diffing — DuckDB
oracle for the declared query, plus null-semantics edge cases the
fixture cannot produce (NULL→value, value→NULL, NULL→NULL)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from ai_ready_data_framework_spark.io import table_path
from ai_ready_data_framework_spark.operators.relational import (
    SNAPDIFF_DROP_REM,
    SNAPDIFF_MOD_MOD,
    SNAPDIFF_MOD_REM,
    SNAPDIFF_NEWDROP_MOD,
    SNAPDIFF_NEWDROP_REM,
    snapshot_diff,
)
from ai_ready_data_framework_spark.registry import QUERIES


def test_snapshot_diff_matches_duckdb_oracle(spark, sf_correctness):
    sql = f"""
        WITH base AS (
            SELECT o_orderkey,
                   ROUND(o_totalprice, 2) AS total_price,
                   o_orderpriority AS priority
            FROM read_parquet('{table_path(sf_correctness, "orders")}')
        ),
        old AS (
            SELECT * FROM base
            WHERE o_orderkey % {SNAPDIFF_MOD_MOD} != {SNAPDIFF_DROP_REM}
        ),
        new AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % {SNAPDIFF_MOD_MOD}
                             = {SNAPDIFF_MOD_REM}
                        THEN ROUND(total_price + 1.0, 2)
                        ELSE total_price END AS total_price,
                   CASE WHEN o_orderkey % {SNAPDIFF_MOD_MOD}
                             = {SNAPDIFF_MOD_REM}
                        THEN 'REPRIORITIZED' ELSE priority END AS priority
            FROM base
            WHERE o_orderkey % {SNAPDIFF_NEWDROP_MOD}
                  != {SNAPDIFF_NEWDROP_REM}
        ),
        joined AS (
            SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS k,
                   o.o_orderkey IS NOT NULL AS in_old,
                   n.o_orderkey IS NOT NULL AS in_new,
                   (o.total_price IS DISTINCT FROM n.total_price)
                       AS chg_price,
                   (o.priority IS DISTINCT FROM n.priority) AS chg_prio
            FROM old o FULL OUTER JOIN new n USING (o_orderkey)
        ),
        kinds AS (
            SELECT CASE WHEN NOT in_old THEN 'added'
                        WHEN NOT in_new THEN 'removed'
                        WHEN chg_price OR chg_prio THEN 'modified'
                        ELSE 'unchanged' END AS diff_kind,
                   chg_price, chg_prio
            FROM joined
        )
        SELECT diff_kind, CAST(NULL AS VARCHAR) AS detail,
               CAST(COUNT(*) AS BIGINT) AS n_keys
        FROM kinds GROUP BY 1
        UNION ALL
        SELECT 'col_changed', 'total_price', CAST(COUNT(*) AS BIGINT)
        FROM kinds WHERE diff_kind = 'modified' AND chg_price
        UNION ALL
        SELECT 'col_changed', 'priority', CAST(COUNT(*) AS BIGINT)
        FROM kinds WHERE diff_kind = 'modified' AND chg_prio
    """
    expected = {tuple(r) for r in duckdb.connect().execute(sql).fetchall()}
    got = {
        tuple(r)
        for r in QUERIES["q_snapshot_diff"](spark, sf_correctness).collect()
    }
    assert got == expected
    kinds = {r[0]: r[2] for r in got if r[1] is None}
    # every diff kind must actually occur on the fixture, or the
    # derivation tests nothing
    assert set(kinds) == {"added", "removed", "modified", "unchanged"}
    assert all(v > 0 for v in kinds.values()), kinds


def test_snapshot_diff_null_semantics(spark):
    """NULL→value and value→NULL are changes; NULL→NULL is not; a NULL
    in the first compared column must not read as row-absence (the
    presence flags are literals, not data)."""
    old = spark.createDataFrame(
        [(1, None, "a"), (2, 5.0, None), (3, None, None), (4, 1.0, "d")],
        "k int, v double, s string",
    )
    new = spark.createDataFrame(
        [(1, 7.0, "a"), (2, 5.0, None), (3, None, None), (5, 2.0, "e")],
        "k int, v double, s string",
    )
    rows = {
        r.k: (r.diff_kind, r.chg_v, r.chg_s)
        for r in snapshot_diff(old, new, "k", ["v", "s"]).collect()
    }
    assert rows[1] == ("modified", True, False)  # NULL -> 7.0
    assert rows[2] == ("unchanged", False, False)  # NULL == NULL per col
    assert rows[3] == ("unchanged", False, False)  # all-NULL row present
    assert rows[4][0] == "removed"
    assert rows[5][0] == "added"
