"""Streaming incremental near-dedup (streaming/dedup.py): micro-batch
probe-and-fold over the persisted band index must equal the one-shot
batch probe over the same corpus/batch split, and the index table must
grow by exactly the streamed bands."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_ready_data_framework_spark.io import load_table
from ai_ready_data_framework_spark.operators.ai import incremental_band_probe
from ai_ready_data_framework_spark.sources.maintenance import (
    read_band_index,
    write_band_index,
)
from ai_ready_data_framework_spark.streaming import dedup as SD

STREAM_MOD = 5  # doc_id % 5 == 0 arrives via the stream, in two drops


def test_stream_probe_equals_one_shot_batch_probe(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents")
    stream_docs = docs.filter(F.col("doc_id") % STREAM_MOD == 0)
    index_docs = docs.filter(F.col("doc_id") % STREAM_MOD != 0)

    index_bands = SD.doc_bands(index_docs)
    table = "band_index_stream_test"
    write_band_index(index_bands, table, str(tmp_path / "index"))
    try:
        # two landing-zone drops -> two micro-batches
        drop_dir = tmp_path / "drops"
        cols = ["doc_id", "text", "lang", "source", "n_chars"]
        first = stream_docs.filter(F.col("doc_id") % (2 * STREAM_MOD) == 0)
        second = stream_docs.filter(F.col("doc_id") % (2 * STREAM_MOD) != 0)
        first.select(*cols).coalesce(1).write.parquet(str(drop_dir / "d1"))
        second.select(*cols).coalesce(1).write.parquet(str(drop_dir / "d2"))

        # file stream over the drop dirs (glob), one file per trigger
        SD.run_incremental_dedup_stream(
            spark,
            str(drop_dir / "*"),
            table,
            str(tmp_path / "pairs"),
            str(tmp_path / "ckpt"),
        )

        got_rows = spark.read.parquet(str(tmp_path / "pairs")).collect()
        got = {
            (frozenset((r.new_doc, r.other_doc)), r.est_jaccard)
            for r in got_rows
        }
        # one-shot twin: same docs, batch membership as a flag
        one_shot = incremental_band_probe(
            SD.doc_bands(docs).withColumn(
                "__new", F.col("doc_id") % STREAM_MOD == 0
            ),
            is_new=F.col("__new"),
        ).collect()
        expected = {
            (frozenset((r.new_doc, r.other_doc)), r.est_jaccard)
            for r in one_shot
        }
        assert expected, "fixture must produce stream-touching dup pairs"
        assert got == expected
        # no pair emitted twice across micro-batches
        assert len(got_rows) == len(
            {frozenset((r.new_doc, r.other_doc)) for r in got_rows}
        )
        # the fold half: index grew by exactly the streamed bands
        n_index = read_band_index(spark, table).count()
        assert n_index == index_bands.count() + SD.doc_bands(stream_docs).count()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
