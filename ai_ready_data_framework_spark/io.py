"""Table IO: load the canonical test tables from a scale-factor dir.

The corpus (TESTDATA.md / FIXTURES.md) is a TPC-H-ish star schema plus
``events`` (stream-shaped), ``documents`` and ``embeddings`` (AI
tables), one Parquet file per table.

Scale note: ``spark.read.parquet`` on a directory of files yields
splittable columnar scans with predicate pushdown and column pruning;
at 100 TB the same call reads a partitioned lake layout unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor: their
# cardinality is fixed by the schema (5 regions, 25 nations) or grows
# sublinearly. Joins against these must never shuffle the fact side.
BROADCASTABLE = {"region", "nation", "supplier", "part", "customer"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Schema comes from the Parquet footer (declared,
    machine-readable — requirements.yaml:25-27); we never infer.

    ``events.ts`` is stored as Parquet TIMESTAMP(NANOS); with
    ``nanosAsLong`` Spark surfaces raw int64 nanos. All values in the
    corpus are whole microseconds, so ``ts DIV 1000`` (integer division
    — float division would lose precision above 2^53 ns) followed by
    ``timestamp_micros`` reconstructs the exact same µs timestamp that
    DuckDB reads natively.
    """
    # The corpus stores wall-clock-UTC timestamps (isAdjustedToUTC=false);
    # DuckDB reads them as naive-UTC. The session zone must be UTC so the
    # NTZ->LTZ normalization below is the identity on the wall clock and
    # epoch math (unix_micros etc.) agrees with the oracle on every
    # executor. session.py pins it at build time; only re-pin when a
    # foreign session (e.g. the driver's) arrives with a different zone —
    # an unconditional set here would silently override caller state on
    # every read (ADVICE r3).
    # NOTE: no two-arg conf.get here — Spark 4 validates the fallback
    # string against the timezone conf's parser, so get(key, "") throws
    # on any session that never set the conf explicitly (a fresh
    # default-config session). One-arg get returns the effective zone
    # (the JVM default when unset).
    try:
        tz = spark.conf.get("spark.sql.session.timeZone")
    except Exception:
        tz = None
    if tz != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    # Spark 4 infers parquet isAdjustedToUTC=false as TIMESTAMP_NTZ, which
    # unix_micros/to_utc_timestamp reject. Normalize to TIMESTAMP (LTZ in
    # the UTC session) so every operator sees one timestamp type.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Small driver-side table as a JVM LocalRelation (LocalTableScan).

    ``spark.createDataFrame(<python list>)`` parallelizes PICKLED rows
    into defaultParallelism partitions, and the resulting ExistingRDD
    scan re-runs one Python worker PER PARTITION on EVERY evaluation —
    including every broadcast rebuild. Measured on local[32]: forcing a
    2048-row codebook frame burns ~10 CPU-s of pure worker start/IPC,
    and a query holding three such relations (q_join_interval's
    chain/offset maps) paid ~15 CPU-s per execution for a few hundred
    rows (guide §4: the Python boundary; same failure schema_diff's
    VALUES-literal comment documents). Routing the rows through a
    pandas frame lets the Arrow path materialize the data ONCE at
    construction into a LocalTableScan — execution and broadcasts
    never touch Python again (measured: the same force drops to
    ~0.8 CPU-s).

    Values and schema are identical to the plain path (object-dtype
    Series preserve ints/None exactly; the explicit ``schema`` is
    applied the same way) — pinned in tests/test_localrel.py. Any
    conversion surprise falls back to the plain path: correctness
    never depends on the optimization.
    """
    rows = list(rows)
    try:
        import pandas as pd

        from pyspark.sql.types import StructType

        if isinstance(schema, StructType):
            names = schema.names
        else:
            names = StructType.fromDDL(schema).names
        data = {
            name: pd.Series([r[i] for r in rows], dtype=object)
            for i, name in enumerate(names)
        }
        pdf = pd.DataFrame(data, columns=names)
        return spark.createDataFrame(pdf, schema=schema)
    except Exception:
        return spark.createDataFrame(rows, schema)


# Compressed input bytes per spread task. Sized by WORK budget, never
# core count (the multimodal SYNTH_ROWS_PER_TASK principle): the chains
# spread_scan feeds (tokenize/shingle/hash explodes) do ~10-30x the
# input bytes of expression work, so a 64 KiB compressed slice is
# ~100-300 ms of JVM work — the ~5-10 ms fixed task cost stays under
# ~5%. Measured r13 at sf0.1 (594 KB documents table → ~9 tasks):
# q_dedup_spans wall 2.63→1.16 s with CPU 5.5→4.8 s; forcing one task
# per CORE instead (32) made wall WORSE (1.43 s) at 2x the CPU — the
# exact "tuned for local core count" trap the round brief forbids.
SPREAD_BYTES_PER_TASK = 64 << 10

# Arrow/pandas stages carry a per-task fixed cost a JVM map chain does
# not — a Python worker round-trip (spawn-or-attach + Arrow stream
# setup, ~100-300 ms when workers are cold). Sizing pandas tasks by
# the JVM budget quadrupled q_ewma's CPU for no wall gain (measured
# r13: 32 tasks over 2 MB = 11.8 CPU-s vs 4.9 of actual recursion);
# a 4x byte budget keeps the fixed cost under ~20% of task work.
SPREAD_BYTES_PER_PANDAS_TASK = 256 << 10

# spread_parts' last-resort width when even the SparkContext is
# unreachable (mirrors session.DEFAULT_SHUFFLE_PARTITIONS' default
# without importing session here).
DEFAULT_SHUFFLE_PARTITIONS_FALLBACK = 32


def spread_scan(df: DataFrame, key: str, target: int | None = None) -> DataFrame:
    """Hash-spread a FEW-FILE table scan before a CPU-heavy map chain
    (tokenize/shingle/hash explodes): a single-file corpus scans as ONE
    task — guide §2.5's input-skew case — which serializes the
    expensive per-row work no matter how many cores the host has
    (measured r13: q_dedup_exact's gram build ran 2.1 s in one task at
    sf0.1 while 31 cores idled).

    Scale-adaptive, never a constant: the spread targets one task per
    ``SPREAD_BYTES_PER_TASK`` of compressed input, capped at
    ``defaultParallelism`` (total cluster cores), and it is a NO-OP
    whenever the scan already has at least that many input files — the
    100 TB layout — or the frame is streaming or file sizes are
    unreadable, so at scale no extra exchange appears in the plan.
    Partitioning is by hash of ``key`` (deterministic, task-retry-safe;
    guide §2.5 warns against rand()-derived keys), and per-document row
    order is preserved because each document is one input row until the
    downstream explode — partition-order-sensitive results cannot
    change.
    """
    try:
        if df.isStreaming:
            return df
        sc = df.sparkSession.sparkContext
        files = df.inputFiles()
        if target is None:
            bytes_in = 0
            for f in files:
                if f.startswith("file:"):
                    f = f[len("file:"):]
                bytes_in += os.path.getsize(f)
            target = max(1, -(-bytes_in // SPREAD_BYTES_PER_TASK))
        n = min(target, sc.defaultParallelism)
        if n <= 1 or len(files) >= n:
            return df
    except Exception:  # pragma: no cover - defensive: never block a read
        return df
    return df.repartition(n, F.col(key))


def spread_parts(
    df: DataFrame, bytes_per_task: int = SPREAD_BYTES_PER_TASK
) -> int:
    """Byte-budget partition count for a MANDATORY keyed repartition
    (e.g. the clustering shuffle a mapInPandas state machine needs for
    correctness): same ``SPREAD_BYTES_PER_TASK`` work budget and
    defaultParallelism cap as ``spread_scan``, but never a no-op — the
    caller's repartition must happen regardless, this only picks an
    EXPLICIT count so AQE cannot collapse the CPU-heavy Python stage
    behind it to one or two post-shuffle tasks (the q_pack_sequences
    lesson: a small-bytes exchange before heavy per-row work is
    exactly what AQE's byte-based coalescing gets wrong). At scale the
    budget saturates the defaultParallelism cap, which is the
    production answer for a keyed shuffle feeding Python work."""
    try:
        par = df.sparkSession.sparkContext.defaultParallelism
    except Exception:  # pragma: no cover - defensive: never block a read
        return DEFAULT_SHUFFLE_PARTITIONS_FALLBACK
    try:
        if df.isStreaming:
            return par
        files = df.inputFiles()
        if not files:
            # No file lineage (LocalRelation, createDataFrame,
            # checkpointed/RDD-backed frames): 0 bytes would compute a
            # 1-task count and serialize the caller's pandas stage
            # through one worker (ADVICE r13). Unknown size ⇒ stay wide.
            return par
        bytes_in = 0
        for f in files:
            if f.startswith("file:"):
                f = f[len("file:"):]
            bytes_in += os.path.getsize(f)
        target = max(1, -(-bytes_in // bytes_per_task))
        return min(target, par)
    except Exception:  # pragma: no cover - unreadable sizes: stay wide
        return par


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every canonical table present in ``sf_dir``.

    Missing tables are skipped so the loader also works on partial
    layouts (e.g. a dir holding only documents+embeddings).
    """
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        if os.path.exists(table_path(sf_dir, name)):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view for spark.sql use."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
