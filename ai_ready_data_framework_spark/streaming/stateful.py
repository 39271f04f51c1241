"""T6: arbitrary per-key streaming state via ``applyInPandasWithState``.

Grounding: "Freshness monitoring tracks data age against SLAs"
(/root/reference/factors/3-current.md:15) and feature staleness
tolerance (/root/reference/factors/requirements.yaml:111-113). The
built-in windowed aggregates (T1-T3) can't express "remember the last
thing I saw per key and alert on silence" — that needs custom state,
which Structured Streaming exposes as ``applyInPandasWithState``:
per-key state rows held in the executor-local state store, user logic
receiving Arrow batches, watermark-driven timeout eviction in
production.

Scale design: state is partitioned by the grouping key across
executors (one shuffle to co-locate, then state stays put across
micro-batches); each key's state row here is 3 scalars, so 100M
tracked keys is a few GB spread over the cluster. The test/backfill
path runs ``trigger(availableNow)`` for determinism — same operator,
same state store, bounded input.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ai_ready_data_framework_spark.io import load_table
from ai_ready_data_framework_spark.registry import query

SNAPSHOT_SCHEMA = "user_id bigint, n_events bigint, max_ts_us bigint, sum_value double"
STATE_SCHEMA = "n bigint, max_us bigint, total double"

# A user whose latest event lags the corpus high-water mark by more
# than this is "stale" (freshness alarm). Anchored on max(ts) in the
# data, never wall clock (determinism rule, SURVEY.md §7).
FRESHNESS_SLA_US = 24 * 3600 * 1_000_000


def _update_user_state(
    key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key state update: running (count, max event time, value sum).
    Emits the updated snapshot each micro-batch the key appears in —
    the streaming twin of ``groupBy(user).agg(count, max, sum)``, but
    with state we own and could extend (alarm debounce, decay, etc.)."""
    (user_id,) = key
    n, max_us, total = state.get if state.exists else (0, 0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        max_us = max(max_us, int(pdf["ts_us"].max()))
        total += float(pdf["value"].sum())
    state.update((n, max_us, total))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "max_ts_us": [max_us],
            "sum_value": [total],
        }
    )


def user_activity_snapshots(events: DataFrame) -> DataFrame:
    """Apply the stateful operator to a (batch or streaming) events
    DataFrame. Input needs ``user_id``, ``ts`` (timestamp), ``value``."""
    keyed = events.select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=SNAPSHOT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_stream(
    spark: SparkSession, sf_dir: str, n_files: int = 4
) -> DataFrame:
    """Run the stateful operator over the events table staged as
    ``n_files`` parquet files (=> n micro-batches under
    ``maxFilesPerTrigger=1``), drain with ``availableNow``, and reduce
    the per-batch emits to the final snapshot per key (n_events is
    monotone, so the max-count emit is the last one).

    The stream runs under a pinned small shuffle-partition count
    (code-review r13): a stateful stream instantiates one state store
    PER shuffle partition PER micro-batch, so a default-200-partition
    driver session pays 200 store setups x n_files batches to
    aggregate a test-sized table — the exact measured cost
    parity.run_stream pins away for the same harness shape.
    Partitioning never changes stateful-agg semantics, only layout;
    the caller's conf is restored after."""
    stage_dir = tempfile.mkdtemp(prefix="aird_stateful_")
    sink = None
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        events = load_table(spark, sf_dir, "events")
        src = os.path.join(stage_dir, "events_stream")
        events.repartition(n_files).write.mode("overwrite").parquet(src)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        snapshots = user_activity_snapshots(stream)
        sink = f"stateful_{uuid.uuid4().hex[:8]}"
        q = (
            snapshots.writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .option("checkpointLocation", os.path.join(stage_dir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        emits = spark.table(sink)
        # memory-sink rows live on the driver; copy before cleanup
        emits = spark.createDataFrame(emits.collect(), emits.schema)
        final = emits.groupBy("user_id").agg(
            F.max_by(F.struct("n_events", "max_ts_us", "sum_value"), "n_events").alias(
                "s"
            )
        )
        return final.select(
            "user_id",
            F.col("s.n_events").alias("n_events"),
            F.col("s.max_ts_us").alias("max_ts_us"),
            F.round("s.sum_value", 4).alias("sum_value"),
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        if sink is not None:
            # drop the uuid-named memory sink — it holds a
            # driver-resident row copy for the session lifetime
            # otherwise (code-review r13)
            spark.catalog.dropTempView(sink)
        shutil.rmtree(stage_dir, ignore_errors=True)


@query("q_stateful_freshness")  # custom stateful streaming → rows-only
def q_stateful_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 end-to-end: stateful per-user activity tracking through a
    real ``availableNow`` stream, then the freshness alarm — users whose
    last event lags the corpus high-water mark beyond the SLA. The
    alarm comparison is a plain batch query over the state output, so
    the streaming operator stays minimal."""
    snap = run_stateful_stream(spark, sf_dir)
    hwm = snap.agg(F.max("max_ts_us").alias("hwm"))
    return (
        snap.crossJoin(F.broadcast(hwm))
        .select(
            "user_id",
            "n_events",
            "sum_value",
            ((F.col("hwm") - F.col("max_ts_us")) > FRESHNESS_SLA_US).alias("stale"),
        )
    )
