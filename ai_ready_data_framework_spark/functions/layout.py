"""Multi-dimensional clustering layout (Z-order) for file skipping.

Grounding: clustered layouts for access optimization
(/root/reference/factors/requirements.yaml:42-44). Sorting a table by
ONE column gives perfect min/max pruning on that column and none on any
other; interleaving the bits of TWO columns (Morton / Z-order — public
technique, Morton 1966) gives every file a tight min/max box on BOTH,
so a 100 TB scan with predicates on either dimension (or a box on both)
skips most row groups. This is the layout primitive behind
Delta/Iceberg OPTIMIZE ZORDER, implemented here as pure Catalyst
expressions + a range-partitioned sorted write.

The z-value is computed with higher-order functions (one aggregate over
bit positions), not per-row Python; 2^i factors come from pow() on
doubles, exact for the 16-bit range used.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # per-dimension resolution; z-value fits in 32 bits


def normalize_to_bits(col: Column, lo: float, hi: float, bits: int = Z_BITS) -> Column:
    """Min-max scale a numeric column to the integer range [0, 2^bits)."""
    span = max(hi - lo, 1e-12)
    scaled = (col.cast("double") - F.lit(lo)) / F.lit(span) * ((1 << bits) - 1)
    return F.round(scaled).cast("long")


def zvalue(a_bits: Column, b_bits: Column, bits: int = Z_BITS) -> Column:
    """Interleave the low ``bits`` bits of two normalized integer
    columns: a's bit i lands at position 2i, b's at 2i+1. One
    aggregate over the bit positions — codegen'd, no UDF."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: (
            acc
            + (F.floor(a_bits / F.pow(F.lit(2.0), i).cast("long")) % 2)
            * F.pow(F.lit(4.0), i).cast("long")
            + (F.floor(b_bits / F.pow(F.lit(2.0), i).cast("long")) % 2)
            * F.lit(2)
            * F.pow(F.lit(4.0), i).cast("long")
        ),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Z-order curve over (col_a, col_b): range-partition by z-value (so
    files own contiguous curve segments), sort within partitions, drop
    the helper column. Each file's parquet min/max stats then bound a
    small box in BOTH dimensions — the property tests/test_layout.py
    measures against a hash-random layout.

    The min/max probe is one tiny aggregate job; at production scale
    the writer would take the bounds from table statistics instead."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    z = zvalue(
        normalize_to_bits(F.col(col_a), float(lo_a), float(hi_a)),
        normalize_to_bits(F.col(col_b), float(lo_b), float(hi_b)),
    )
    # Tie-break the range key: repartitionByRange picks boundaries by
    # SAMPLING, and when many rows share one z-value a boundary can
    # land between duplicates, leaving an empty range partition (and
    # thus a missing output file — observed as an order-dependent test
    # flake, since the sampler's seed derives from the RDD id). A
    # second, high-cardinality range column makes boundaries unique
    # without changing curve locality.
    tiebreak = F.xxhash64(*[F.col(c) for c in df.columns])
    (
        df.withColumn("__z", z)
        .withColumn("__tb", tiebreak)
        .repartitionByRange(n_files, "__z", "__tb")
        .sortWithinPartitions("__z")
        .drop("__z", "__tb")
        .write.mode("overwrite")
        .parquet(path)
    )
