"""Batch/stream parity harness (training_serving_parity, check 25).

"Fraction of features with identical computation logic between batch
and real-time paths" (/root/reference/factors/requirements.yaml:107-109).
Our design makes the fraction 1.0 *by construction*: a feature
transform is a plain ``DataFrame -> DataFrame`` function applied
unchanged to a batch read and to a ``readStream`` — Structured
Streaming's incrementalization of the same logical plan is Spark's
core guarantee (3-current.md:13 "Streams propagate changes
incrementally").

The harness runs the stream with ``trigger(availableNow=True)`` and a
generous watermark so runs are deterministic and bounded — the same
configuration a backfill uses in production, which is exactly the
point: one code path, batch and streaming.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_ready_data_framework_spark.io import load_table

Transform = Callable[[DataFrame], DataFrame]

# Late-data tolerance for the deterministic harness: larger than the
# whole events span, so watermarking is exercised without dropping
# rows regardless of file arrival order (arrival order of files is not
# deterministic, event time order across micro-batches isn't either).
HARNESS_WATERMARK = "365 days"


def hourly_event_features(df: DataFrame) -> DataFrame:
    """Shared feature transform: per (user, hour) event counts + value
    sums. Watermarked event-time aggregation — legal in both batch
    (watermark is a no-op) and streaming (bounds state)."""
    return (
        df.withWatermark("ts", HARNESS_WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def sliding_event_features(df: DataFrame) -> DataFrame:
    """Shared transform (T2): 1-hour windows sliding every 30 minutes —
    each event lands in exactly two windows (replication factor =
    size/slide; keep that ratio small at scale)."""
    return (
        df.withWatermark("ts", HARNESS_WATERMARK)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n_events",
            "sum_value",
        )
    )


def session_features(df: DataFrame) -> DataFrame:
    """Shared transform (T3 streaming form): gap-based session windows
    via ``F.session_window`` — Spark merges overlapping per-event
    sessions in state across micro-batches; in batch the same
    expression computes sessions in one aggregation. Boundary
    semantics: an event exactly gap after the previous one starts a NEW
    session (half-open [start, last+gap) windows)."""
    return (
        df.withWatermark("ts", HARNESS_WATERMARK)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def deduped_events(df: DataFrame) -> DataFrame:
    """Shared transform: drop duplicate event_ids (T5 stateful dedup).
    NOTE: plain dropDuplicates holds every seen key in state forever in
    streaming — see deduped_events_bounded for the production form."""
    return df.withWatermark("ts", HARNESS_WATERMARK).dropDuplicates(["event_id"])


def deduped_events_bounded(df: DataFrame) -> DataFrame:
    """T5, state-bounded form: ``dropDuplicatesWithinWatermark`` evicts
    a key's state once the watermark passes its event time — the only
    dedup that survives an unbounded stream (plain dropDuplicates state
    grows monotonically). Spark rejects the call on batch DataFrames,
    so the batch path uses plain dropDuplicates — semantically
    identical whenever duplicates arrive within the watermark, which
    the parity test then proves on this corpus."""
    if df.isStreaming:
        return df.withWatermark("ts", HARNESS_WATERMARK).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return df.dropDuplicates(["event_id"])


STREAM_JOIN_WINDOW = "INTERVAL 1 HOUR"


def purchase_click_join(df: DataFrame) -> DataFrame:
    """Stream-stream interval self-join: each purchase joined to the
    same user's clicks within the preceding hour — the attribution
    shape (3-current.md:12-15 change/stream semantics). In streaming,
    BOTH sides are unbounded, so Spark buffers each side in state and
    the event-time range condition is what lets the engine evict
    matched-out rows once the watermark passes (without it, join state
    grows forever — the condition is a correctness requirement at
    scale, not an optimization). In batch the identical expression is
    a plain range join. Inner join → append output mode."""
    left = (
        df.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", HARNESS_WATERMARK)
    )
    right = (
        df.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", HARNESS_WATERMARK)
    )
    cond = (
        (left.p_user == right.c_user)
        & (right.c_ts >= left.p_ts - F.expr(STREAM_JOIN_WINDOW))
        & (right.c_ts <= left.p_ts)
    )
    return left.join(right, cond, "inner").select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        F.unix_micros("p_ts").alias("p_ts_us"),
        F.unix_micros("c_ts").alias("c_ts_us"),
    )


def run_batch(
    spark: SparkSession, sf_dir: str, transform: Transform, table: str = "events"
) -> DataFrame:
    return transform(load_table(spark, sf_dir, table))


def _stage_stream_dir(
    spark: SparkSession,
    sf_dir: str,
    n_files: int,
    stage_dir: str,
    table: str = "events",
) -> str:
    """Materialize the source table as n_files parquet files so
    availableNow processes multiple micro-batches
    (maxFilesPerTrigger=1)."""
    src_df = load_table(spark, sf_dir, table)
    path = os.path.join(stage_dir, f"{table}_stream")
    src_df.repartition(n_files).write.mode("overwrite").parquet(path)
    return path


def run_stream(
    spark: SparkSession,
    sf_dir: str,
    transform: Transform,
    n_files: int = 4,
    table: str = "events",
) -> DataFrame:
    """Run the same transform as an availableNow stream over the events
    table staged as ``n_files`` files (=> n micro-batches), collecting
    into a memory sink in complete/append mode as appropriate.
    Returns the final result DataFrame."""
    stage_dir = tempfile.mkdtemp(prefix="aird_stream_")
    sink = None
    # A stateful stream materializes one state-store instance PER
    # shuffle partition PER micro-batch: under the driver's default 200
    # partitions this harness pays 200 store setups x n_files batches
    # to aggregate a test-sized table (measured: the parity check alone
    # was ~17s of q_assessment's wall). Pin a small partition count for
    # the stream's lifetime and restore the caller's conf after —
    # partitioning never changes stateful-agg SEMANTICS, only layout.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        src = _stage_stream_dir(spark, sf_dir, n_files, stage_dir, table)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        result = transform(stream)
        sink = f"parity_{uuid.uuid4().hex[:8]}"
        mode = "complete" if not result.isStreaming or _is_agg(result) else "append"
        q = (
            result.writeStream.format("memory")
            .queryName(sink)
            .outputMode(mode)
            .option(
                "checkpointLocation",
                os.path.join(stage_dir, "ckpt"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # memory sink rows live on the driver; copy before cleanup
        out = spark.table(sink)
        out = spark.createDataFrame(out.collect(), out.schema)
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        # drop the uuid-named memory sink: without this every stream
        # run leaks a catalog-referenced driver-resident row copy for
        # the session lifetime (code-review r13)
        if sink is not None:
            spark.catalog.dropTempView(sink)
        shutil.rmtree(stage_dir, ignore_errors=True)


def _is_agg(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().analyzed().toString()  # noqa: SLF001
    return "Aggregate" in plan


def parity_fraction(
    spark: SparkSession, sf_dir: str, transform: Transform, table: str = "events"
) -> float:
    """The actual check-25 measurement: MULTISET parity between the
    batch and streaming results — 1.0 only when the two are identical
    as bags of rows. Code-review r13 hardened both halves of the old
    form: concat_ws silently SKIPS NULL columns (rows differing only
    in WHICH column is NULL hashed equal), so each column now
    serializes through an explicit NULL sentinel; and probing only
    batch→stream made extra or duplicated stream rows invisible, so
    the score is now matched-multiset / max(|batch|, |stream|) —
    missing rows, extra rows, and multiplicity drift all lower it."""
    batch = run_batch(spark, sf_dir, transform, table)
    stream = run_stream(spark, sf_dir, transform, table=table)
    cols = sorted(batch.columns)

    def hashed_counts(df: DataFrame, alias: str) -> DataFrame:
        h = F.sha2(
            F.concat_ws(
                "\x1f",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
                    for c in cols
                ],
            ),
            256,
        )
        return df.select(h.alias("h")).groupBy("h").agg(
            F.count("*").alias(alias)
        )

    n_batch, n_stream = batch.count(), stream.count()
    if n_batch == 0 and n_stream == 0:
        return 1.0
    matched = (
        hashed_counts(batch, "nb")
        .join(hashed_counts(stream, "ns"), "h")
        .agg(F.sum(F.least("nb", "ns")))
        .collect()[0][0]
    ) or 0
    return matched / max(n_batch, n_stream)


def make_enriched_events(spark: SparkSession, sf_dir: str) -> Transform:
    """T9 stream-static join: enrich the event stream with a broadcast
    dimension (customer segment) — the canonical serving-side
    enrichment. The STATIC side is a plain batch DataFrame captured by
    the closure; Structured Streaming re-joins it per micro-batch
    (stream-static joins need no watermark or state), so the same
    closure runs unchanged in batch and streaming — parity by
    construction, verified by hash in tests."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )

    def enriched(df: DataFrame) -> DataFrame:
        return df.join(F.broadcast(cust), "user_id").select(
            "event_id",
            "user_id",
            "event_type",
            "c_mktsegment",
            F.round("value", 4).alias("value"),
        )

    return enriched


def weighted_sample_stream(df: DataFrame) -> DataFrame:
    """Streaming twin of q_mix_weighted's mixture freeze: the
    per-source md5-threshold gate is a stateless per-row filter, so
    the SAME expression runs on a document STREAM with no watermark or
    state — a corpus can be mixture-sampled while it ingests, and
    batch==stream identity is exact by construction (parity-tested)."""
    from ai_ready_data_framework_spark.operators.ai import (
        MIX_DEFAULT_WEIGHT,
        MIX_WEIGHTS,
        mix_threshold_hex,
    )

    thr = F.lit(mix_threshold_hex(MIX_DEFAULT_WEIGHT))
    for src, w in MIX_WEIGHTS.items():
        thr = F.when(F.col("source") == src, F.lit(mix_threshold_hex(w))).otherwise(
            thr
        )
    h8 = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8)
    return df.filter(h8 < thr).select("doc_id", "source", "lang")


def quality_sample_stream(df: DataFrame) -> DataFrame:
    """Streaming twin of q_sample_quality's soft quality gate
    (qsample_gate: k·10^8 < m²·2^32, exact int64): per-row text
    scoring + integer compare, stateless — the quality-weighted corpus
    freeze works on a live ingest stream byte-for-byte like batch."""
    from ai_ready_data_framework_spark.functions import text as T
    from ai_ready_data_framework_spark.operators.ai import qsample_gate

    keep, keep_prob = qsample_gate(F.col("doc_id"), T.quality_score(F.col("text")))
    return df.filter(keep).select(
        "doc_id", "source", keep_prob.alias("keep_prob")
    )
