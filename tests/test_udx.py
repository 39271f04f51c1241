"""UDF/UDAF/UDTF extension surface: each example must compute exactly
what its native-expression twin computes (functions/udx.py policy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_ready_data_framework_spark.functions import udx
from ai_ready_data_framework_spark.io import load_table


def test_scalar_pandas_udf_matches_native(spark, sf_smoke):
    cust = load_table(spark, sf_smoke, "customer")
    both = cust.select(
        udx.slugify(F.col("c_name")).alias("udf_slug"),
        udx.slugify_native(F.col("c_name")).alias("native_slug"),
    )
    assert both.filter(F.col("udf_slug") != F.col("native_slug")).count() == 0
    row = both.first()
    assert row.udf_slug and "-" in row.udf_slug  # Customer#000... -> customer-000...


def test_grouped_agg_pandas_udf_matches_native(spark, sf_smoke):
    events = load_table(spark, sf_smoke, "events")
    udf_side = events.groupBy("event_type").agg(
        F.round(udx.geometric_mean(F.col("value")), 6).alias("gm")
    )
    native_side = events.groupBy("event_type").agg(
        F.round(udx.geometric_mean_native("value"), 6).alias("gm")
    )
    u = {(r.event_type, r.gm) for r in udf_side.collect()}
    n = {(r.event_type, r.gm) for r in native_side.collect()}
    # float-sum order differs (pandas per-group vs partial agg); compare
    # with tolerance per group rather than set equality
    un, nn = dict(u), dict(n)
    assert un.keys() == nn.keys() and len(un) > 0
    for k in un:
        assert abs(un[k] - nn[k]) < 1e-4, (k, un[k], nn[k])


def test_udtf_matches_posexplode(spark):
    spark.udtf.register("word_index", udx.WordIndexUDTF)
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "a b")], "id long, text string"
    )
    df.createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        """
        SELECT d.id, w.pos, w.word, w.n_chars
        FROM udtf_docs d, LATERAL word_index(d.text) w
        """
    ).collect()
    native = df.select(
        "id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    ).select("id", "pos", "word", F.length("word").alias("n_chars"))
    assert sorted(map(tuple, got)) == sorted(map(tuple, native.collect()))
    assert len(got) == 6
