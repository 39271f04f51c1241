"""Streaming CDC apply == batch MERGE (streaming/cdc.py).

The changelog streams through foreachBatch in 4 micro-batches, each
folding one cdc_merge step into the maintained snapshot; the final
snapshot must equal the single-shot batch merge (q_cdc_apply) exactly
— same keys, same prices, same last_op tags."""

from __future__ import annotations

import tempfile

from ai_ready_data_framework_spark.registry import QUERIES
from ai_ready_data_framework_spark.streaming.cdc import run_cdc_stream_orders


def test_streaming_cdc_equals_batch_merge(spark, sf_smoke):
    with tempfile.TemporaryDirectory(prefix="aird_cdc_") as work:
        streamed = run_cdc_stream_orders(spark, sf_smoke, work, n_files=4)
        got = {tuple(r) for r in streamed.collect()}
    expected = {tuple(r) for r in QUERIES["q_cdc_apply"](spark, sf_smoke).collect()}
    assert got == expected
    assert len(got) > 0
    # all three op outcomes must be visible in the streamed snapshot
    assert {op for _, _, op in got} == {"keep", "update", "insert"}
