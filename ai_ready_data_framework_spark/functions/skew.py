"""Skew-handling rewrites (SURVEY.md north star: "skewed keys hurt …
salting for skew").

AQE already splits skewed partitions for sort-merge joins
(``spark.sql.adaptive.skewJoin``, on in session.py). These helpers
cover the planner-resistant cases:

- **exact count-distinct on a hot group key** — a single reducer owns
  the whole hot group's value set; AQE cannot split it because
  correctness requires co-locating the group. Salting by the DISTINCT
  column splits the value set instead: values are disjoint across
  salts, so per-salt distinct counts sum exactly.
- **equi-join where the probe side has hot keys and the build side is
  too big to broadcast** — replicate the build side n ways and salt
  the probe side deterministically, turning one hot partition into n
  warm ones.

Both rewrites are exact (tested against the unsalted forms); salt
values derive from xxhash64 of data columns, never from randomness, so
results stay reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salted_count_distinct(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Exact per-group COUNT(DISTINCT distinct_col) in two shuffles of
    (group, salt) instead of one shuffle that lands every hot-group row
    on one reducer.

    Correctness: salt = hash(distinct value) % n, so equal values get
    equal salts — each distinct value is counted in exactly one salt
    bucket and the per-salt counts are additive. Returns
    ``group_cols + [n_distinct]``.
    """
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salts))
    per_salt = (
        df.select(*group_cols, F.col(distinct_col), salt.alias("__salt"))
        .groupBy(*group_cols, "__salt")
        .agg(F.countDistinct(distinct_col).alias("__n"))
    )
    return per_salt.groupBy(*group_cols).agg(
        F.sum("__n").alias("n_distinct")
    )


def replicated_skew_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    n_salts: int = DEFAULT_SALTS,
    salt_by: Column | str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot probe-side keys when ``build`` is too
    large to broadcast: probe rows get a deterministic salt in
    [0, n_salts) derived from ``salt_by`` (default: the probe's own
    join-key hash mixed with every column — pass a high-cardinality
    column for best spread); build rows are replicated once per salt.
    Join key becomes (on, salt): the hot key's rows now spread over
    ``n_salts`` partitions.

    Cost: build side shuffles n_salts x its size — worth it when
    probe-side skew stalls the job, wasteful otherwise. ``how`` is
    restricted to inner/left (semantics preserved per probe row; a
    right/full outer would emit every unmatched build row once per
    salt replica — n_salts spurious copies).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "replicated_skew_join supports how in {'inner','left'}: "
            "build-side replication is probe-row-preserving only; "
            f"got {how!r}"
        )
    if salt_by is None:
        salt_src = F.xxhash64(*[F.col(c) for c in probe.columns])
    else:
        salt_src = F.xxhash64(F.col(salt_by) if isinstance(salt_by, str) else salt_by)
    salted_probe = probe.withColumn("__salt", F.pmod(salt_src, F.lit(n_salts)))
    replicated_build = build.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")),
    )
    return salted_probe.join(replicated_build, [on, "__salt"], how).drop("__salt")


# Keys whose probe-side row count exceeds this are treated as hot by
# the two-path rewrite. At 100 TB "hot" means a group big enough to
# stall one reducer — thousands of times the average — so a coarse
# absolute default is fine; callers tune it from q_skew_profile's
# group-size distribution (max/p99 vs mean is exactly what that
# profile reports).
DEFAULT_HOT_THRESHOLD = 1000


def hot_split_skew_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    n_salts: int = DEFAULT_SALTS,
    hot_threshold: int = DEFAULT_HOT_THRESHOLD,
    salt_by: Column | str | None = None,
    how: str = "inner",
) -> DataFrame:
    """The production form of :func:`replicated_skew_join`: replicate
    the build side ONLY for the hot keys (two-path join), instead of
    n_salts x the whole build table.

    1. One map-side-combinable count over the probe keys finds the hot
       tail (count > hot_threshold) — by definition a TINY set (a key
       is only hot because it concentrates rows), so it broadcasts.
    2. COLD path: probe rows anti-joined against the hot tail join
       build plain — no replication, AQE free to pick the strategy
       (the anti-join-vs-hot-tail doctrine: filter against the small
       hot set, never semi-join against the near-full cold set).
    3. HOT path: probe rows semi-joined to the hot tail get salted;
       build rows for hot keys (semi-join, also tiny) replicate
       n_salts ways; join on (key, salt).
    4. Union — exactly the plain join's rows (tested against it).

    Cost vs the brute form: build-side replication shrinks from
    n_salts x |build| to n_salts x |build ∩ hot|, and the cold
    majority pays one plain hash join. The brute form stays available
    (and hash-graded through q_join_inner's salted_replicated leg) as
    the worst-case-shape equivalence proof; this form is what a 100 TB
    job should run.

    ``how`` is restricted to inner/left (ADVICE r8): the two-path
    decomposition preserves semantics per PROBE row only. Under
    right/full outer, a build row on a hot key would emit an unmatched
    null-probe row from the cold path (probe_cold lacks hot keys)
    while also matching in the hot path — spurious duplicates."""
    if how not in ("inner", "left"):
        raise ValueError(
            "hot_split_skew_join supports how in {'inner','left'}: the "
            "hot/cold two-path split is probe-row-preserving only; "
            f"got {how!r}"
        )
    hot_keys = (
        probe.groupBy(on)
        .agg(F.count("*").alias("__cnt"))
        .filter(F.col("__cnt") > hot_threshold)
        .select(on)
    )
    probe_cold = probe.join(F.broadcast(hot_keys), on, "left_anti")
    probe_hot = probe.join(F.broadcast(hot_keys), on, "left_semi")
    build_hot = build.join(F.broadcast(hot_keys), on, "left_semi")
    cold = probe_cold.join(build, on, how)
    hot = replicated_skew_join(
        probe_hot, build_hot, on, n_salts=n_salts, salt_by=salt_by, how=how
    )
    return cold.unionByName(hot)
