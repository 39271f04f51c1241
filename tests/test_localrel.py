"""io.local_df — the LocalRelation fast path for small driver-side
tables (round 13, guide §4: the Python boundary).

Pins the two things that matter:
- EQUIVALENCE: values and schema are identical to the plain
  ``spark.createDataFrame(rows, schema)`` path for every row shape the
  call sites use (ints, strings, doubles, array<double>, None, empty).
- THE OPTIMIZATION ITSELF: with Arrow on (the engine session default),
  the plan is a LocalTableScan — NOT an ExistingRDD scan, whose
  evaluation re-runs one Python worker per partition per action
  (measured ~10-15 CPU-s per force on local[32] before round 13).
"""

from __future__ import annotations

from ai_ready_data_framework_spark.io import local_df

CASES = [
    ([(1, "a", 1.5), (2, None, None)], "id long, s string, x double"),
    ([(0, [1.0, 2.0]), (1, [0.0, -0.5])], "k int, cw array<double>"),
    ([("only", 7)], "name string, n int"),
    ([], "query_id bigint, rank bigint, vec_id bigint, cosine double"),
]


def test_local_df_matches_plain_createdataframe(spark):
    for rows, schema in CASES:
        fast = local_df(spark, rows, schema)
        plain = spark.createDataFrame(rows, schema)
        assert fast.schema == plain.schema, (rows, schema)
        assert fast.collect() == plain.collect(), (rows, schema)


def test_local_df_plans_as_local_relation(spark):
    # engine sessions run with Arrow on; that is what makes the pandas
    # route materialize once instead of shipping pickled partitions
    assert (
        spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    )
    df = local_df(
        spark, [(m, k, [float(m), float(k)]) for m in range(8) for k in range(4)],
        "m int, k int, cw array<double>",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan, plan
    assert "ExistingRDD" not in plan, plan


def test_local_df_falls_back_on_unconvertible_input(spark):
    # a schema string fromDDL can't parse goes down the plain path and
    # still raises the same error the plain path would — no silent
    # behavior change
    rows = [(1,)]
    fast = local_df(spark, rows, "n long")
    assert fast.collect() == spark.createDataFrame(rows, "n long").collect()


def test_spread_parts_no_file_lineage_stays_wide(spark):
    # ADVICE r13: a frame with no file lineage (LocalRelation,
    # createDataFrame, checkpointed/RDD-backed) must NOT be treated as
    # 0 bytes -> 1 task; unknown size falls back to defaultParallelism
    # so a pandas stage behind the repartition is never serialized.
    from ai_ready_data_framework_spark.io import spread_parts

    df = local_df(spark, [(1, "a"), (2, "b")], "id long, s string")
    assert df.inputFiles() == []
    assert spread_parts(df) == spark.sparkContext.defaultParallelism
