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


def srp_bands(
    emb: Column | str,
    planes: list[list[float]],
    n_bands: int,
    n_bits: int,
) -> Column:
    """Signed-random-projection (hyperplane) LSH signature, packed into
    band values: bit i = sign(emb . planes[i]); each consecutive group
    of ``n_bits`` bits packs into one integer band value. Two vectors
    collide on a band with probability (1 - theta/pi)^n_bits, the
    classic cosine-LSH guarantee (Charikar '02, public literature).

    Stays fully inside Catalyst: the plane matrix is ONE nested array
    literal and both the bit and the packing loops are higher-order
    functions (transform/aggregate), so codegen sees two array loops —
    not n_bands*n_bits unrolled aggregate expressions.
    """
    if len(planes) != n_bands * n_bits:
        raise ValueError(f"need {n_bands * n_bits} planes, got {len(planes)}")
    e = F.col(emb) if isinstance(emb, str) else emb
    planes_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in p]) for p in planes]
    )
    bits = F.transform(
        planes_lit,
        lambda p: F.when(dot(e, p) >= 0, F.lit(1)).otherwise(F.lit(0)),
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.aggregate(
            F.slice(bits, b * n_bits + 1, n_bits),
            F.lit(0),
            lambda acc, x: acc * 2 + x,
        ),
    )
