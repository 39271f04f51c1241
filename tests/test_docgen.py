"""Custom Python data source (sources/docgen.py): registration, read,
determinism, and doc_id-range filter pushdown with partition pruning."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

from ai_ready_data_framework_spark.sources.docgen import (
    DocGenReader,
    register_docgen,
)


def test_docgen_reads_deterministically(spark):
    register_docgen(spark)
    df = spark.read.format("docgen").option("n_docs", 500).load()
    rows = sorted(map(tuple, df.collect()))
    assert len(rows) == 500
    assert [r[0] for r in rows] == list(range(500))
    again = sorted(
        map(
            tuple,
            spark.read.format("docgen").option("n_docs", 500).load().collect(),
        )
    )
    assert rows == again
    # declared-schema contract: n_chars really is length(text)
    bad = df.filter(F.length("text") != F.col("n_chars")).count()
    assert bad == 0


def test_docgen_filter_pushdown_preserves_content(spark):
    """Rows surviving a pushed range filter must be byte-identical to
    the same rows from an unfiltered read — pruning may never change
    generated content."""
    register_docgen(spark)
    full = {
        r.doc_id: tuple(r)
        for r in spark.read.format("docgen").option("n_docs", 400).load().collect()
    }
    part = spark.read.format("docgen").option("n_docs", 400).load().filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 230)
    )
    got = {r.doc_id: tuple(r) for r in part.collect()}
    assert sorted(got) == list(range(100, 230))
    for k, v in got.items():
        assert v == full[k]


def test_docgen_prunes_partitions():
    """Unit-level: pushFilters narrows the planned range and whole
    partitions outside it are never planned."""
    r = DocGenReader({"n_docs": "1000", "n_partitions": "10"})
    assert len(r.partitions()) == 10
    residual = list(
        r.pushFilters(
            [GreaterThanOrEqual(("doc_id",), 250), LessThan(("doc_id",), 450)]
        )
    )
    assert residual == []  # both consumed
    parts = r.partitions()
    assert len(parts) == 3  # chunks [200,300) [300,400) [400,500), clipped
    assert parts[0].lo == 250 and parts[-1].hi == 450


def test_docgen_stream_reads_whole_corpus_once(spark, tmp_path):
    """Streaming read: availableNow drains the generator to n_docs in
    batch_size micro-batch partitions; the union of all batches is
    exactly the batch read (same (seed, doc_id) content function)."""
    register_docgen(spark)
    stream = (
        spark.readStream.format("docgen")
        .option("n_docs", 300)
        .option("batch_size", 64)
        .load()
    )
    (
        stream.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "out")).collect())
    )
    batch = sorted(
        map(
            tuple,
            spark.read.format("docgen").option("n_docs", 300).load().collect(),
        )
    )
    assert got == batch
