"""T6 stateful streaming: applyInPandasWithState vs batch aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_ready_data_framework_spark.io import load_table
from ai_ready_data_framework_spark.streaming.stateful import (
    q_stateful_freshness,
    run_stateful_stream,
)


def test_stateful_stream_matches_batch(spark, sf_smoke):
    """The final per-key state after draining the stream must equal the
    batch groupBy over the same events — exact on counts and max event
    time, tolerance on float sums (accumulation order differs)."""
    snap = run_stateful_stream(spark, sf_smoke, n_files=4)
    batch = (
        load_table(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("b_n"),
            F.unix_micros(F.max("ts")).alias("b_max_us"),
            F.sum("value").alias("b_sum"),
        )
    )
    joined = snap.join(batch, "user_id", "full_outer").collect()
    assert joined, "no users compared"
    for row in joined:
        assert row["n_events"] == row["b_n"], row
        assert row["max_ts_us"] == row["b_max_us"], row
        assert abs(row["sum_value"] - row["b_sum"]) < 1e-3, row


def test_stateful_freshness_flags(spark, sf_smoke):
    out = q_stateful_freshness(spark, sf_smoke).collect()
    assert out
    # the user owning the high-water-mark event is never stale
    assert any(not r["stale"] for r in out)
    for r in out:
        assert r["n_events"] > 0
