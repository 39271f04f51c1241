"""Incremental materialized-view maintenance proofs (q_mv_incremental):

1. The delta-merged MV equals a FULL RECOMPUTE over the CDC-applied
   snapshot, computed in Spark — the defining property of incremental
   view maintenance.
2. The same MV equals DuckDB's independent recompute (engine oracle).

Integer milli-unit sums make both equalities exact (no float-order
slack)."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from ai_ready_data_framework_spark.io import load_table, table_path
from ai_ready_data_framework_spark.operators import relational as rel
from ai_ready_data_framework_spark.registry import QUERIES


def _snapshot_recompute_spark(spark, sf_dir):
    """Full recompute: apply the changelog to the snapshot, then
    re-aggregate from scratch — the expensive path the incremental
    merge must reproduce bit-for-bit."""
    orders = load_table(spark, sf_dir, "orders")
    rem = F.col("o_orderkey") % 10
    mils = F.round(F.col("o_totalprice") * 1000).cast("long")
    upd_mils = F.round(F.col("o_totalprice") * 1100).cast("long")
    survivors = orders.filter(rem != rel.CDC_DELETE_REM).select(
        "o_orderpriority",
        F.when(rem == rel.CDC_UPDATE_REM, upd_mils).otherwise(mils).alias("m"),
    )
    inserts = orders.filter(rem == rel.CDC_INSERT_REM).select(
        "o_orderpriority", mils.alias("m")
    )
    return (
        survivors.unionByName(inserts)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("m").alias("sum_price_mils"),
        )
    )


def test_mv_incremental_equals_full_recompute_spark(spark, sf_correctness):
    inc = {
        tuple(r)
        for r in QUERIES["q_mv_incremental"](spark, sf_correctness).collect()
    }
    full = {
        tuple(r)
        for r in _snapshot_recompute_spark(spark, sf_correctness).collect()
    }
    assert inc == full
    assert len(inc) > 0


def test_mv_incremental_matches_duckdb_oracle(spark, sf_correctness):
    o = table_path(sf_correctness, "orders")
    sql = f"""
        WITH b AS (
            SELECT o_orderkey, o_orderpriority, o_totalprice,
                   o_orderkey % 10 AS rem
            FROM read_parquet('{o}')
        ),
        snap AS (
            SELECT o_orderpriority,
                   CASE WHEN rem = {rel.CDC_UPDATE_REM}
                        THEN CAST(round(o_totalprice * 1100) AS BIGINT)
                        ELSE CAST(round(o_totalprice * 1000) AS BIGINT)
                   END AS m
            FROM b WHERE rem <> {rel.CDC_DELETE_REM}
            UNION ALL
            SELECT o_orderpriority, CAST(round(o_totalprice * 1000) AS BIGINT)
            FROM b WHERE rem = {rel.CDC_INSERT_REM}
        )
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(m) AS BIGINT) AS sum_price_mils
        FROM snap GROUP BY 1
    """
    expected = {tuple(r) for r in duckdb.connect().execute(sql).fetchall()}
    got = {
        tuple(r)
        for r in QUERIES["q_mv_incremental"](spark, sf_correctness).collect()
    }
    assert got == expected


def test_group_sample_matches_duckdb_oracle(spark, sf_correctness):
    from ai_ready_data_framework_spark.operators import ai

    d = table_path(sf_correctness, "documents")
    sql = f"""
        SELECT doc_id, source, lang, sample_rank FROM (
            SELECT doc_id, source, lang,
                   CAST(row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS BIGINT) AS sample_rank
            FROM read_parquet('{d}')
        ) WHERE sample_rank <= {ai.GROUP_SAMPLE_K}
    """
    expected = {tuple(r) for r in duckdb.connect().execute(sql).fetchall()}
    rows = QUERIES["q_group_sample"](spark, sf_correctness).collect()
    assert {tuple(r) for r in rows} == expected
    # exactly K per source (every source has > K docs at sf0.01)
    by_src = {}
    for r in rows:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    assert all(v == ai.GROUP_SAMPLE_K for v in by_src.values()), by_src
