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
