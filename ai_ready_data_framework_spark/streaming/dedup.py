"""Streaming incremental near-dedup: micro-batches of new documents
probe the PERSISTED LSH band index, emit their near-dup pairs, then
fold their own bands into the index — the always-on ingestion twin of
q_dedup_incremental (operators/ai.py).

Grounding: the reference's Factor 3 mandates stream-incremental
propagation ("Streams propagate changes incrementally",
/root/reference/factors/3-current.md:13) and the north star makes
near-dedup a first-class pipeline stage; this module is where the two
meet. Per micro-batch the work is (batch bands) ⋈ (index), so steady-
state cost scales with ingest rate, never corpus size — the property
that keeps a 100 TB corpus's dedup always-on instead of nightly.

Exactly-once note: the pairs sink is an append; a replayed epoch would
re-append its pairs. Production wraps the two writes in the WAP pattern
(sources/maintenance.py::write_audit_publish) or dedups downstream on
the (new_doc, other_doc) key — the same contract streaming/cdc.py
documents for its snapshot writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_ready_data_framework_spark.functions import text as T
from ai_ready_data_framework_spark.operators.ai import (
    SHINGLE_K,
    incremental_band_probe,
)
from ai_ready_data_framework_spark.sources.maintenance import (
    append_band_index,
    read_band_index,
)

DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def doc_bands(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, __sig, band, bk) band postings — the same
    shingle -> minhash -> band derivation the batch operators use, so
    stream and batch can never drift."""
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(T.shingles(T.tokens("text"), SHINGLE_K))
        ).alias("s"),
    )
    return T.minhash_bands(T.minhash_signatures(sh, "doc_id", "s"), "doc_id")


def probe_and_fold(
    spark: SparkSession,
    batch_docs: DataFrame,
    index_table: str,
    pairs_out: str,
) -> None:
    """One micro-batch step: probe the persisted index with the batch
    (index rows __new=False, batch rows True — within-batch dups pair
    too), append the pairs, then fold the batch's bands into the
    index so the NEXT batch sees these docs as corpus."""
    batch_bands = doc_bands(batch_docs)
    idx = read_band_index(spark, index_table).withColumn(
        "__new", F.lit(False)
    )
    allb = idx.unionByName(batch_bands.withColumn("__new", F.lit(True)))
    pairs = incremental_band_probe(allb, is_new=F.col("__new"))
    pairs.write.mode("append").parquet(pairs_out)
    append_band_index(batch_bands, index_table)
    # The fold appends THROUGH the micro-batch's cloned session, which
    # invalidates only the clone's relation cache; the driving
    # session's cached file listing for the index table would stay
    # stale and the NEXT epoch would probe yesterday's index (measured:
    # cross-batch dup pairs silently vanish). Refresh the session we
    # read with.
    spark.catalog.refreshTable(index_table)


def run_incremental_dedup_stream(
    spark: SparkSession,
    stream_docs_dir: str,
    index_table: str,
    pairs_out: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Drive the incremental dedup over a file stream of document
    parquet drops. availableNow + maxFilesPerTrigger=1 gives one
    micro-batch per dropped file — deterministic for tests, and the
    exact shape of a production landing-zone listener."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stream_docs_dir)
    )

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        probe_and_fold(spark, batch_df, index_table, pairs_out)

    (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
