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


CORRUPT_COL = "_corrupt_record"


def read_json_quarantine(
    spark: SparkSession, path: str, schema: Ty.StructType | str
) -> tuple[DataFrame, DataFrame]:
    """S2 with bad-record routing: parse newline-delimited JSON against
    the declared schema and SPLIT the result into (good, quarantine) —
    good rows carry the declared columns; rows that failed to parse
    keep their raw line in the quarantine frame for replay/repair.

    This is the ingest shape a 100 TB pipeline actually needs: one
    malformed producer must neither kill the job (FAILFAST) nor
    silently vanish (DROPMALFORMED); PERMISSIVE + corrupt-column
    capture + split gives an auditable quarantine at zero extra scans
    (both frames share one source; the filter is a map-side predicate).
    """
    if isinstance(schema, str):
        schema = Ty.StructType.fromDDL(schema)
    # copy, never schema.add(): StructType.add mutates AND returns
    # self, so the caller's schema object would grow a phantom
    # _corrupt_record field (twice, on a second call)
    with_corrupt = Ty.StructType(
        [*schema.fields, Ty.StructField(CORRUPT_COL, Ty.StringType())]
    )
    df = (
        spark.read.schema(with_corrupt)
        .options(mode="PERMISSIVE", columnNameOfCorruptRecord=CORRUPT_COL)
        .json(path)
    )
    from pyspark.sql import functions as F

    # Spark disallows queries referencing ONLY the corrupt column on a
    # raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); cache the
    # parsed frame so both splits read the materialized parse — which
    # is also the right call operationally (one parse, two consumers).
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad


def read_csv_quarantine(
    spark: SparkSession, path: str, schema: Ty.StructType | str, **options
) -> tuple[DataFrame, DataFrame]:
    """read_json_quarantine's CSV sibling: parse against the declared
    schema, split into (good, quarantine). CSV is the format where this
    matters most at ingest — ragged rows, stray delimiters, unquoted
    newlines — and the same PERMISSIVE + corrupt-column + one-parse
    split applies: a bad row keeps its raw line for replay, a good row
    carries the typed columns, and neither FAILFAST nor DROPMALFORMED
    semantics can eat data silently."""
    if isinstance(schema, str):
        schema = Ty.StructType.fromDDL(schema)
    with_corrupt = Ty.StructType(
        [*schema.fields, Ty.StructField(CORRUPT_COL, Ty.StringType())]
    )
    # caller options may override the header default (headerless CSVs
    # are common) but never the quarantine mechanism itself
    opts = {"header": "true", **options}
    opts["mode"] = "PERMISSIVE"
    opts["columnNameOfCorruptRecord"] = CORRUPT_COL
    df = spark.read.schema(with_corrupt).options(**opts).csv(path)
    from pyspark.sql import functions as F

    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad
