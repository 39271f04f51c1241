"""Sink writers (SURVEY.md §2.2 S4-S5).

Grounding: clustered layouts for access optimization
(/root/reference/factors/requirements.yaml:42-44), batch-columnar for
training vs key-organized for serving (2-consumable.md:23-25),
automatically-maintained materialized views (3-current.md:14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """S4: date/key-partitioned columnar layout. Partition pruning at
    read time is what keeps a 100 TB table's daily scan at 1/365th of
    the bytes; choose low-cardinality partition columns (date, region),
    never high-cardinality keys (small-files explosion)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 64
) -> None:
    """S4 (co-location variant): bucketed + sorted table. Two tables
    bucketed on the same key join WITHOUT a shuffle — the layout to
    pre-pay for repeated fact-to-fact joins at scale."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def write_stream_parquet(
    df: DataFrame, path: str, checkpoint: str, available_now: bool = True
) -> StreamingQuery:
    """S5: streaming materialization with exactly-once file commits via
    the checkpointed file sink. ``availableNow`` drains everything
    currently available then stops — the deterministic backfill trigger
    (same code path as the continuous trigger in production)."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
