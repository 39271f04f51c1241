"""Vector math over ``ArrayType(FloatType)`` columns — pure Catalyst
higher-order functions, no UDFs (grounding: embeddings as first-class
data shape, /root/reference/factors/2-consumable.md:14,
requirements.yaml:54-56, 82-88).

Everything here stays inside whole-stage codegen: ``zip_with`` +
``aggregate`` compile to JVM loops over the array, so cosine top-k at
100 TB is a single scan with no Python crossing and no shuffle until
the final top-k reduction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float arrays, accumulated in double,
    left-to-right (index order — matches the DuckDB oracle's
    accumulation order for bit-stable parity)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe on zero-norm vectors (returns NULL
    rather than dividing by zero)."""
    n = norm(a) * norm(b)
    return F.when(n != 0, dot(a, b) / n)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
