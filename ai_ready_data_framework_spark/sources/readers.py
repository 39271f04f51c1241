"""Source readers (SURVEY.md §2.2 S1-S3).

Grounding: "Native formats (Parquet, JSON, vectors)"
(/root/reference/factors/2-consumable.md:17); streams
(3-current.md:13). Policy: schemas are always DECLARED, never inferred
(schema_type_coverage, requirements.yaml:25-27) — inference is allowed
only at exploratory ingestion boundaries, and none of these readers do
it. An explicit schema also makes the scan a single pass (inference
costs an extra read of 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as Ty


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S1: columnar scan, schema from the footer; splittable, with
    predicate pushdown + column pruning + (optionally) aggregate
    pushdown handled by the Parquet data source."""
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: Ty.StructType | str, **options) -> DataFrame:
    """CSV with a mandatory declared schema. header defaults on;
    malformed rows land in PERMISSIVE null-columns rather than killing
    a 1000-executor job."""
    return (
        spark.read.schema(schema)
        .options(header="true", mode="PERMISSIVE", **options)
        .csv(path)
    )


def read_json_lines(spark: SparkSession, path: str, schema: Ty.StructType | str) -> DataFrame:
    """S2: newline-delimited JSON with a declared schema — one pass,
    no sampling-based inference."""
    return spark.read.schema(schema).json(path)


def read_parquet_stream(
    spark: SparkSession, path: str, schema: Ty.StructType | str, max_files_per_trigger: int = 1
) -> DataFrame:
    """S3: incremental file-stream source over a parquet directory —
    the batch tables' streaming twin (change_detection,
    requirements.yaml:91-93). Schema must be declared (streaming
    sources cannot infer)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
