"""Micro-tests for the as-of join's edge semantics (SURVEY.md §7 hard
parts: ties and missing-feature rows)."""

from __future__ import annotations

import datetime as dt

from ai_ready_data_framework_spark.operators.temporal import as_of_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_basic_tie_and_missing(spark):
    labels = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "l1"),
            (1, _ts("2024-01-01T12:00:00"), "l2"),
            (2, _ts("2024-01-01T09:00:00"), "l3"),  # no prior feature
        ],
        "user_id int, label_ts timestamp, label string",
    )
    features = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), 101, 1.0),
            (1, _ts("2024-01-01T10:00:00"), 102, 2.0),  # tie with l1: <= counts
            (1, _ts("2024-01-01T10:00:00"), 103, 3.0),  # same ts: larger id wins
            (1, _ts("2024-01-01T11:00:00"), 104, 4.0),
            (2, _ts("2024-01-01T11:00:00"), 201, 9.0),  # after l3 → excluded
        ],
        "user_id int, feat_ts timestamp, feat_id int, feat_value double",
    )
    out = {
        r.label: (r.feat_id, r.feat_value)
        for r in as_of_join(
            labels,
            features,
            key="user_id",
            label_ts="label_ts",
            feature_ts="feat_ts",
            feature_cols=["feat_id", "feat_value"],
        ).collect()
    }
    assert out["l1"] == (103, 3.0)  # tie at 10:00 visible, max feat_id
    assert out["l2"] == (104, 4.0)  # latest before 12:00
    assert out["l3"] == (None, None)  # left as-of: no prior feature


def test_asof_no_future_leakage(spark, sf_smoke):
    """point_in_time_correctness audit (check 24): joined feature ts
    must never exceed label ts."""
    from ai_ready_data_framework_spark.io import load_table
    from pyspark.sql import functions as F

    events = load_table(spark, sf_smoke, "events")
    labels = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("lid"), "user_id", F.col("ts").alias("lts")
    )
    features = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("fts"), F.col("event_id").alias("fid")
    )
    joined = as_of_join(
        labels, features, "user_id", "lts", "fts", ["fid", "fts"]
    )
    leaks = joined.filter(F.col("fts") > F.col("lts")).count()
    assert leaks == 0


def test_asof_broadcast_same_edge_semantics(spark):
    """Both strategies must agree on the tie/missing micro-case."""
    from ai_ready_data_framework_spark.operators.temporal import (
        as_of_join_auto,
        as_of_join_broadcast,
    )

    labels = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "l1"),
            (1, _ts("2024-01-01T12:00:00"), "l2"),
            (2, _ts("2024-01-01T09:00:00"), "l3"),
        ],
        "user_id int, label_ts timestamp, label string",
    )
    features = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), 101, 1.0),
            (1, _ts("2024-01-01T10:00:00"), 102, 2.0),
            (1, _ts("2024-01-01T10:00:00"), 103, 3.0),
            (1, _ts("2024-01-01T11:00:00"), 104, 4.0),
            (2, _ts("2024-01-01T11:00:00"), 201, 9.0),
        ],
        "user_id int, feat_ts timestamp, feat_id int, feat_value double",
    )
    for impl in (as_of_join_broadcast, as_of_join_auto):
        out = {
            r.label: (r.feat_id, r.feat_value)
            for r in impl(
                labels,
                features,
                key="user_id",
                label_ts="label_ts",
                feature_ts="feat_ts",
                feature_cols=["feat_id", "feat_value"],
            ).collect()
        }
        assert out["l1"] == (103, 3.0), impl.__name__
        assert out["l2"] == (104, 4.0), impl.__name__
        assert out["l3"] == (None, None), impl.__name__


def test_scd2_history_matches_duckdb_oracle(spark, sf_correctness):
    """SCD2 change-point compression + effective ranges must match a
    DuckDB recomputation row-for-row, and ranges must chain: each
    user's history is contiguous with exactly one open (current) row."""
    import duckdb

    from ai_ready_data_framework_spark.io import table_path
    from ai_ready_data_framework_spark.registry import QUERIES, load_all

    load_all()
    sql = f"""
        WITH e AS (
            SELECT user_id, event_id, ts, value
            FROM read_parquet('{table_path(sf_correctness, "events")}')
        ),
        flagged AS (
            SELECT *, lag(value) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
            ) AS prev
            FROM e
        ),
        changes AS (
            SELECT * FROM flagged WHERE prev IS NULL OR value <> prev
        )
        SELECT user_id,
               ROUND(value, 4) AS state_value,
               epoch_us(ts) AS eff_from_us,
               lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS eff_to_us
        FROM changes
    """
    expected = {
        (r[0], r[1], r[2], r[3])
        for r in duckdb.connect().execute(sql).fetchall()
    }
    rows = QUERIES["q_scd2_history"](spark, sf_correctness).collect()
    got = {(r.user_id, r.state_value, r.eff_from_us, r.eff_to_us) for r in rows}
    assert got == expected
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, hist in by_user.items():
        hist.sort(key=lambda r: r.eff_from_us)
        assert sum(r.is_current for r in hist) == 1, user
        assert hist[-1].eff_to_us is None, user
        for a, b in zip(hist, hist[1:]):
            assert a.eff_to_us == b.eff_from_us, user  # contiguous chain
