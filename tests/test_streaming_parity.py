"""training_serving_parity (check 25): the same transform fn run in
batch and as an availableNow stream must produce identical rows."""

from __future__ import annotations

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
