"""Source/sink roundtrip tests (S1-S5)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ai_ready_data_framework_spark.io import load_table
from ai_ready_data_framework_spark.sources import readers, writers


def test_csv_json_roundtrip(spark, tmp_path):
    df = spark.sql(
        "SELECT * FROM VALUES (1, 'a', 1.5), (2, 'b', 2.5) AS t(id, name, score)"
    )
    csv_path, json_path = str(tmp_path / "csv"), str(tmp_path / "json")
    df.write.mode("overwrite").option("header", "true").csv(csv_path)
    df.write.mode("overwrite").json(json_path)
    schema = "id int, name string, score double"
    back_csv = readers.read_csv(spark, csv_path, schema)
    back_json = readers.read_json_lines(spark, json_path, schema)
    assert sorted(map(tuple, back_csv.collect())) == sorted(map(tuple, df.collect()))
    assert sorted(map(tuple, back_json.collect())) == sorted(map(tuple, df.collect()))


def test_partitioned_write_prunes(spark, sf_smoke, tmp_path):
    orders = load_table(spark, sf_smoke, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_part")
    writers.write_partitioned(orders, path, ["order_year"])
    years = [d for d in os.listdir(path) if d.startswith("order_year=")]
    assert len(years) > 1
    back = readers.read_parquet(spark, path).filter(F.col("order_year") == 1998)
    plan = back._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert back.count() > 0
    # partition pruning: the scan must touch only the matching partition
    assert "order_year=1998" in plan or "PartitionFilters" in plan


def test_bucketed_join_avoids_shuffle(spark, sf_smoke, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with
    ZERO shuffle exchanges — the pre-paid co-location layout for
    repeated fact-to-fact joins at scale."""
    orders = load_table(spark, sf_smoke, "orders")
    lineitem = load_table(spark, sf_smoke, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    writers.write_bucketed(orders, "t_orders_b", "o_orderkey", n_buckets=8)
    writers.write_bucketed(lineitem, "t_lineitem_b", "o_orderkey", n_buckets=8)
    try:
        a, b = spark.table("t_orders_b"), spark.table("t_lineitem_b")
        # disable broadcast so the join must pick SMJ over the buckets
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = a.join(b, "o_orderkey").select("o_orderkey", "o_totalprice", "l_quantity")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "Exchange" not in plan, plan
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_stream_write_roundtrip(spark, sf_smoke, tmp_path):
    events = load_table(spark, sf_smoke, "events")
    src = str(tmp_path / "src")
    events.limit(100).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = readers.read_parquet_stream(spark, src, schema)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = writers.write_stream_parquet(stream, out, ckpt)
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 100


def test_json_quarantine_splits_bad_records(spark, tmp_path):
    """Corrupt JSON lines must land in the quarantine frame with their
    raw text; good rows parse against the declared schema; nothing is
    dropped."""
    p = str(tmp_path / "mixed.jsonl")
    lines = [
        '{"id": 1, "name": "a", "score": 1.5}',
        'this is not json at all',
        '{"id": 2, "name": "b", "score": 2.5}',
        '{"id": "NOT_A_NUMBER", "name": "c", "score": 3.5}',
    ]
    with open(p, "w") as f:
        f.write("\n".join(lines))
    good, bad = readers.read_json_quarantine(
        spark, p, "id long, name string, score double"
    )
    good_rows = {(r.id, r.name, r.score) for r in good.collect()}
    bad_rows = [r.raw_line for r in bad.collect()]
    assert good_rows == {(1, "a", 1.5), (2, "b", 2.5)}
    assert len(bad_rows) == 2
    assert "not json" in bad_rows[0] or "not json" in bad_rows[1]
    assert good.count() + bad.count() == len(lines)


def test_stream_sink_is_exactly_once_on_rerun(spark, sf_smoke, tmp_path):
    """S5 exactly-once: re-starting the same availableNow stream
    against the SAME checkpoint must process nothing new — the file
    sink's commit log makes re-runs idempotent (no duplicated rows)."""
    events = load_table(spark, sf_smoke, "events")
    src = str(tmp_path / "src")
    events.limit(100).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    for _ in range(2):  # second run: same checkpoint, no new input
        stream = readers.read_parquet_stream(spark, src, schema)
        q = writers.write_stream_parquet(stream, out, ckpt)
        q.awaitTermination()
    assert spark.read.parquet(out).count() == 100


def test_csv_quarantine_splits_bad_records(spark, tmp_path):
    """CSV quarantine: typed rows parse into the good frame; ragged /
    type-broken rows keep their raw line in the quarantine — nothing
    dropped, nothing fatal."""
    from ai_ready_data_framework_spark.sources.readers import (
        read_csv_quarantine,
    )

    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,score\n"
        "1,alpha,0.5\n"
        "2,beta,not_a_number\n"
        "3,gamma,0.75\n"
    )
    good, bad = read_csv_quarantine(
        spark, str(p), "id bigint, name string, score double"
    )
    good_rows = {tuple(r) for r in good.collect()}
    bad_rows = [r.raw_line for r in bad.collect()]
    assert good_rows == {(1, "alpha", 0.5), (3, "gamma", 0.75)}
    assert bad_rows == ["2,beta,not_a_number"]
