"""SparkSession factory tuned for this engine.

Local tests run on ``local[N]``; the same config block is what we would
ship to a 1000-executor cluster — AQE (runtime re-planning, skew-join
splitting, partition coalescing) and Arrow (vectorized Python
interchange) are the two switches that matter at both scales.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At 100 TB the shuffle partition count should target ~128-256 MB per
# task post-AQE-coalesce; AQE rescales downward at small SF, so a
# moderately high static number is safe at every scale.
DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "ai-ready-data-framework-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config.

    Config rationale (each line matters at 100 TB):
    - ``adaptive.enabled`` — runtime stage re-planning: converts
      sort-merge joins to broadcast when the built side turns out small,
      splits skewed shuffle partitions, coalesces tiny ones.
    - ``arrow.pyspark.enabled`` — Arrow batches for every pandas UDF /
      toPandas crossing; row-at-a-time pickling is ~10-100x slower.
    - ``shuffle.partitions`` — static upper bound; AQE coalesces down.
    - ``parquet.aggregatePushdown`` — MIN/MAX/COUNT served from footer
      statistics without scanning rows.
    - ``session.timeZone=UTC`` — deterministic timestamp semantics vs
      the DuckDB oracle regardless of host TZ.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Generated-class cache (default 100 entries): this engine runs
        # ~99 multi-stage queries per session, each compiling 10-40
        # whole-stage-codegen fragments — at the default size the cache
        # thrashes and every re-evaluation re-runs Janino + JIT.
        # Thread-level profiling (r13) showed C1+C2 JIT threads burning
        # 27 CPU-s against 10 CPU-s of task work on two q_token_bpe
        # runs. Scale-neutral: a long-running cluster app re-plans the
        # same operators for months; the cache is driver-memory-bounded
        # (~KBs per entry). Static conf — set at session build.
        .config("spark.sql.codegen.cache.maxEntries", "8192")
        .config("spark.sql.session.timeZone", "UTC")
        # events.ts is Parquet TIMESTAMP(NANOS), which Spark's µs
        # TimestampType rejects outright; read the raw int64 nanos and
        # convert exactly in io.load_table (ts DIV 1000 → timestamp_micros).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
