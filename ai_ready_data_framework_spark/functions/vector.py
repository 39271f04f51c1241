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


def hashed_doc_vectors(
    docs, doc_col: str = "doc_id", text_col: str = "text", dim: int = 64
):
    """Signed feature-hashing vectorizer (the 'hashing trick',
    Weinberger 2009 — the stateless text→vector encoder MLlib's
    HashingTF implements, here as pure DataFrame expressions so the
    output feeds this repo's ANN family directly): every token lands
    in bucket ``pmod(xxhash64(token), dim)`` with sign drawn from an
    independent hash bit, per-doc bucket sums are L2-normalized, and
    the result is (doc_id, embedding array<double>, n_tokens).

    Determinism: bucket sums are exact integers, and normalization is
    one IEEE-exact ÷√ per element — bitwise reproducible across runs,
    partitionings, and engines that share xxhash64 (Spark-only in
    practice; the tests therefore pin INVARIANTS — unit norm,
    token-duplication invariance, run-to-run equality — not a DuckDB
    value oracle, the q_dedup_simhash precedent).

    Scale shape: explode → (doc, bucket) map-side-combinable sum →
    per-doc dim-bounded array assembly; two keyed exchanges, both
    linear in postings, nothing driver-side. Empty docs yield the
    zero vector (norm 0) with NULL-free output."""
    from pyspark.sql import functions as F

    from ai_ready_data_framework_spark.functions import text as T

    # spread the tokenize+hash work across the cluster FIRST: the
    # fixture tables (and many real landing zones) arrive as one file,
    # so without this the 7M-token explode runs in ONE task. r13: the
    # keyless-N repartition here was AQE-coalescible — the 0.85 MB
    # shuffle collapsed back to ONE post-shuffle task (measured: the
    # two downstream stages ran 1.4 s + 1.5 s single-task at sf0.1).
    # io.spread_scan repartitions with an explicit byte-budget-derived
    # partition count (AQE leaves explicit-N repartitions alone) and is
    # a NO-OP on multi-file (100 TB) layouts, where the old
    # unconditional exchange shuffled the full text for nothing.
    from ai_ready_data_framework_spark.io import spread_scan

    spread = spread_scan(
        docs.select(
            F.col(doc_col).alias("doc_id"), F.col(text_col).alias("__text")
        ),
        "doc_id",
    )
    toks = spread.select(
        "doc_id",
        F.explode(T.tokens("__text")).alias("tok"),
    ).filter(F.col("tok") != "")
    h = F.xxhash64("tok")
    bucket = F.pmod(h, F.lit(dim)).cast("int")
    # sign from a high hash bit, INDEPENDENT of the low bits the
    # bucket pmod consumes (dim <= 2^32 keeps them disjoint)
    sign = F.when(
        F.pmod(F.shiftrightunsigned(h, 33), F.lit(2)) == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    sums = (
        toks.select("doc_id", bucket.alias("b"), sign.alias("s"))
        .groupBy("doc_id", "b")
        .agg(F.sum("s").cast("long").alias("v"), F.count("*").alias("n"))
    )
    per_doc = sums.groupBy("doc_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("b", "v")))
        ).alias("m"),
        F.sum("n").cast("long").alias("n_tokens"),
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.col("m").getItem(i.cast("int")), F.lit(0)
        ).cast("double"),
    )
    # bind dense + norm in projections BELOW the consumer (memory
    # lesson: an outer-scope expression referenced inside a HOF lambda
    # re-evaluates per element, and a CASE referencing the transform
    # three times embeds three copies — CollapseProject keeps bound
    # non-cheap columns as real attributes)
    bound = per_doc.withColumn("__dense", dense).withColumn(
        "__nrm",
        F.sqrt(
            F.aggregate(F.col("__dense"), F.lit(0.0), lambda a, x: a + x * x)
        ),
    )
    unit = F.when(
        F.col("__nrm") > 0,
        F.transform(F.col("__dense"), lambda x: x / F.col("__nrm")),
    ).otherwise(F.col("__dense"))
    return bound.select(
        F.col("doc_id").alias(doc_col), unit.alias("embedding"), "n_tokens"
    )
