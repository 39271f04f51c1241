"""training_serving_parity (check 25): the same transform fn run in
batch and as an availableNow stream must produce identical rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_ready_data_framework_spark.streaming import parity


def test_hourly_features_parity(spark, sf_smoke):
    assert parity.parity_fraction(spark, sf_smoke, parity.hourly_event_features) == 1.0


def test_sliding_window_parity(spark, sf_smoke):
    """T2: sliding windows must aggregate identically in batch and
    across micro-batches."""
    assert (
        parity.parity_fraction(spark, sf_smoke, parity.sliding_event_features) == 1.0
    )


def test_session_window_parity(spark, sf_smoke):
    """T3: session_window must produce identical sessions in batch and
    across micro-batches (state-merged) in streaming."""
    assert parity.parity_fraction(spark, sf_smoke, parity.session_features) == 1.0


def test_stream_stream_join_parity(spark, sf_smoke):
    """Stream-stream interval self-join (purchase x preceding-hour
    clicks) must emit exactly the batch range-join's rows across
    micro-batches, including pairs whose two sides arrive in DIFFERENT
    micro-batches (state-buffered join)."""
    batch = parity.run_batch(spark, sf_smoke, parity.purchase_click_join)
    stream = parity.run_stream(spark, sf_smoke, parity.purchase_click_join)
    assert batch.count() == stream.count()
    assert parity.parity_fraction(spark, sf_smoke, parity.purchase_click_join) == 1.0


def test_dedup_parity(spark, sf_smoke):
    batch = parity.run_batch(spark, sf_smoke, parity.deduped_events)
    stream = parity.run_stream(spark, sf_smoke, parity.deduped_events)
    assert batch.count() == stream.count()
    assert (
        batch.select("event_id").subtract(stream.select("event_id")).count() == 0
    )


def test_dedup_bounded_parity(spark, sf_smoke):
    """T5 production form: watermark-evicted dedup state must still
    produce the batch-identical event_id set on this corpus."""
    batch = parity.run_batch(spark, sf_smoke, parity.deduped_events_bounded)
    stream = parity.run_stream(spark, sf_smoke, parity.deduped_events_bounded)
    assert batch.count() == stream.count()
    assert (
        batch.select("event_id").subtract(stream.select("event_id")).count() == 0
    )


def test_stream_static_join_parity(spark, sf_smoke):
    """T9: stream-static dimension enrichment — the broadcast join
    against the static customer dim must emit identical enriched rows
    in batch and across micro-batches (and must not drop events whose
    user exists: inner-join row count pinned against the batch side)."""
    transform = parity.make_enriched_events(spark, sf_smoke)
    batch = parity.run_batch(spark, sf_smoke, transform)
    stream = parity.run_stream(spark, sf_smoke, transform)
    assert batch.count() == stream.count() > 0
    assert parity.parity_fraction(spark, sf_smoke, transform) == 1.0


def test_watermark_drops_late_rows_stream_vs_batch(spark, tmp_path):
    """T4 explicit late-data semantics (VERDICT r3 #8): rows arriving
    in a later micro-batch whose window closed behind the watermark are
    DROPPED by the stream, while the identical transform over the same
    data in batch (where withWatermark is a no-op) counts them — the
    documented batch/stream difference for late data.

    File 1 (oldest mtime -> first micro-batch) carries events up to
    12:59, advancing the 1-hour watermark to 11:59. File 2 ticks one
    more micro-batch, during which the [10:00, 11:00) window falls
    behind the watermark and is EMITTED + EVICTED. File 3 then delivers
    a 10:20 straggler into the evicted window — the stream drops it.
    (Eviction uses the watermark computed from the PREVIOUS batch, so
    the drop is observable only two batches after the advance — a
    straggler in file 2 would still sneak into live state.)"""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    src = tmp_path / "late_events"
    src.mkdir()

    # microsecond UTC-adjusted timestamps: the session carries the
    # legacy nanosAsLong conf for the old testdata layout, which would
    # surface pandas' default ns timestamps as BIGINT
    arrow_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us", tz="UTC")),
            ("value", pa.float64()),
        ]
    )

    def write(name, rows, mtime_offset_s):
        table = pa.table(
            {
                "event_id": [r[0] for r in rows],
                "ts": [r[1].replace(tzinfo=dt.timezone.utc) for r in rows],
                "value": [1.0] * len(rows),
            },
            schema=arrow_schema,
        )
        p = str(src / name)
        pq.write_table(table, p)
        now = 1_760_000_000
        os.utime(p, (now + mtime_offset_s, now + mtime_offset_s))

    t = lambda h, m: dt.datetime(2026, 1, 1, h, m)
    write(
        "f1.parquet",
        [(1, t(10, 15)), (2, t(10, 45)), (3, t(11, 15)), (4, t(12, 59))],
        0,
    )
    # batch 2: watermark 11:59 is now operative; the 10:00 window is
    # emitted and evicted at this batch's end
    write("f2.parquet", [(5, t(13, 30))], 60)
    # batch 3: straggler into the evicted window -> dropped
    write("f3.parquet", [(6, t(10, 20))], 120)

    def hourly_counts(df):
        return (
            df.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n_events"))
            .select(
                F.date_format("w.start", "HH:mm").alias("window_start"),
                "n_events",
            )
        )

    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    import uuid

    table = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        hourly_counts(stream)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_rows = {r.window_start: r.n_events for r in spark.table(table).collect()}

    # append mode emits only windows finalized behind the final
    # watermark (12:30): 10:00 WITHOUT the dropped straggler, and
    # 11:00; the 12:00/13:00 windows are still open and withheld
    assert stream_rows == {"10:00": 2, "11:00": 1}

    # batch twin: watermark is a no-op, every row counts, every window
    # materializes — the straggler lands in the 10:00 window
    batch_rows = {
        r.window_start: r.n_events
        for r in hourly_counts(spark.read.parquet(str(src))).collect()
    }
    assert batch_rows == {"10:00": 3, "11:00": 1, "12:00": 1, "13:00": 1}


def test_weighted_sample_parity(spark, sf_smoke):
    """The mixture-freeze gate is stateless, so the streamed sample is
    IDENTICAL to batch (fraction 1.0), and matches the registered
    q_mix_weighted row set."""
    from ai_ready_data_framework_spark.registry import QUERIES
    from ai_ready_data_framework_spark.streaming.parity import (
        parity_fraction,
        run_stream,
        weighted_sample_stream,
    )

    assert (
        parity_fraction(
            spark, sf_smoke, weighted_sample_stream, table="documents"
        )
        == 1.0
    )
    streamed = {
        (r.doc_id, r.source)
        for r in run_stream(
            spark, sf_smoke, weighted_sample_stream, table="documents"
        ).collect()
    }
    batch = {
        (r.doc_id, r.source)
        for r in QUERIES["q_mix_weighted"](spark, sf_smoke).collect()
    }
    assert streamed == batch and streamed


def test_quality_sample_parity(spark, sf_smoke):
    """The int64 quality gate freezes the same docs on a stream as in
    batch — and the same set q_sample_quality registers."""
    from ai_ready_data_framework_spark.registry import QUERIES
    from ai_ready_data_framework_spark.streaming.parity import (
        parity_fraction,
        quality_sample_stream,
        run_stream,
    )

    assert (
        parity_fraction(
            spark, sf_smoke, quality_sample_stream, table="documents"
        )
        == 1.0
    )
    streamed = {
        r.doc_id
        for r in run_stream(
            spark, sf_smoke, quality_sample_stream, table="documents"
        ).collect()
    }
    batch = {
        r.doc_id for r in QUERIES["q_sample_quality"](spark, sf_smoke).collect()
    }
    assert streamed == batch and streamed


def test_streaming_assessment_score_table_parity(spark, sf_smoke, tmp_path):
    """VERDICT r12 #4: the 48-check battery as an availableNow
    micro-batch job over a landing zone, reusing the batch check fns
    (training_serving_parity discipline, requirements.yaml:107-109).
    Stream == batch score-table parity is exact on every
    deterministic row; kind-'P' checks measure their own run's
    wall-clock (two runs measure two different executions — the same
    reason run_assessment times them serially), so their criterion is
    presence + in-range, not value equality. A second landing file
    triggers a fresh epoch with the same contract."""
    import shutil

    from ai_ready_data_framework_spark.checks.engine import run_assessment
    from ai_ready_data_framework_spark.streaming.assessment import (
        run_assessment_stream,
    )

    zone = str(tmp_path / "zone")
    scores_out = str(tmp_path / "scores")
    ckpt = str(tmp_path / "ckpt")
    shutil.copytree(sf_smoke, zone)  # the landing zone IS an sf-layout
    # the trigger table of a REAL landing zone is a directory that
    # receives files (the file stream source requires one); the static
    # testdata ships it as a single file, so re-shape it
    import os

    doc_file = os.path.join(zone, "documents.parquet")
    tmp_dir = os.path.join(zone, "__docs_tmp")
    os.mkdir(tmp_dir)
    shutil.move(doc_file, os.path.join(tmp_dir, "part-00000.parquet"))
    os.rename(tmp_dir, doc_file)

    batch = run_assessment(spark, zone, run_streaming=False)
    run_assessment_stream(spark, zone, scores_out, ckpt)
    streamed = spark.read.parquet(f"{scores_out}/epoch=0")

    def canon(df):
        return sorted(
            tuple(r)
            for r in df.filter(~F.col("kind").contains("P")).collect()
        )

    def p_rows(df):
        return df.filter(F.col("kind").contains("P")).collect()

    assert canon(streamed) == canon(batch)  # hash-equivalent: exact rows
    assert streamed.count() == batch.count() == 48
    assert {r.requirement for r in p_rows(streamed)} == {
        r.requirement for r in p_rows(batch)
    }
    assert all(0.0 <= r.value <= 1.0 for r in p_rows(streamed))

    # new data lands -> the next run scores a NEW epoch (continuous
    # monitoring, not one-shot), and the fresh score table reflects
    # the zone's current state with the same 48-row contract
    extra = spark.createDataFrame(
        [(990001, "late landing doc", "en", "src_z", 16)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    extra.coalesce(1).write.mode("append").parquet(f"{zone}/documents.parquet")
    run_assessment_stream(spark, zone, scores_out, ckpt)
    epochs = sorted(
        r.epoch
        for r in spark.read.parquet(scores_out)
        .select("epoch")
        .distinct()
        .collect()
    )
    assert len(epochs) == 2
    latest = spark.read.parquet(f"{scores_out}/epoch={epochs[-1]}")
    assert latest.count() == 48
    assert all(0.0 <= r.value <= 1.0 for r in latest.collect())
