"""Maintenance/layout writers: shard determinism + balance, compaction
conservation, additive schema evolution via mergeSchema."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ai_ready_data_framework_spark.io import load_table
from ai_ready_data_framework_spark.sources.maintenance import (
    compact,
    write_training_shards,
)

N_SHARDS = 8


def _files(path):
    return sorted(f for f in os.listdir(path) if f.endswith(".parquet"))


def _shard_dirs(path):
    return sorted(d for d in os.listdir(path) if d.startswith("__shard="))


def test_training_shards_balanced_and_deterministic(spark, sf_correctness, tmp_path):
    docs = load_table(spark, sf_correctness, "documents")
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_training_shards(docs, p1, "doc_id", N_SHARDS)
    # rerun from a DIFFERENT input layout: same shards must come out
    write_training_shards(docs.repartition(13), p2, "doc_id", N_SHARDS)

    assert len(_shard_dirs(p1)) == N_SHARDS
    assert _shard_dirs(p1) == _shard_dirs(p2)
    counts = []
    for d in _shard_dirs(p1):
        a = spark.read.parquet(os.path.join(p1, d)).collect()
        b = spark.read.parquet(os.path.join(p2, d)).collect()
        # content AND order identical per shard
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        counts.append(len(a))
    assert sum(counts) == docs.count()
    # hash sharding balances within ~3x at this corpus size
    assert max(counts) <= 3 * max(1, min(counts)), counts


def test_compact_reduces_files_conserves_rows(spark, sf_correctness, tmp_path):
    orders = load_table(spark, sf_correctness, "orders")
    path = str(tmp_path / "frag")
    orders.repartition(64).write.mode("overwrite").parquet(path)
    assert len(_files(path)) == 64
    before = orders.count()
    n = compact(spark, path, target_file_bytes=512 * 1024)
    assert len(_files(path)) == n < 64
    assert spark.read.parquet(path).count() == before


def test_schema_evolution_merge_read(spark, tmp_path):
    """Additive column evolution: v2 files carry a new column; a
    mergeSchema read surfaces the superset schema with NULLs for v1
    rows — the read-side contract for declared-schema evolution."""
    path = str(tmp_path / "evolve")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    v1.write.mode("overwrite").parquet(path + "/v=1")
    v2 = spark.createDataFrame(
        [(3, "c", 0.5)], "id long, name string, score double"
    )
    v2.write.mode("overwrite").parquet(path + "/v=2")
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "name", "score", "v"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].score is None and rows[3].score == 0.5
    assert merged.count() == 3


def test_write_audit_publish_gates_bad_data(spark, sf_correctness, tmp_path):
    """WAP: passing audits publish atomically; a failing audit raises,
    keeps staging for inspection, and never creates the published
    path."""
    import pytest

    from ai_ready_data_framework_spark.sources.maintenance import (
        AuditFailure,
        write_audit_publish,
    )

    docs = load_table(spark, sf_correctness, "documents")
    good_path = str(tmp_path / "published")
    audits = {
        "nonempty": lambda d: d.count() > 0,
        "no_null_ids": lambda d: d.filter(F.col("doc_id").isNull()).count() == 0,
    }
    write_audit_publish(spark, docs, good_path, audits)
    assert spark.read.parquet(good_path).count() == docs.count()
    assert not os.path.exists(
        os.path.join(
            os.path.dirname(good_path),
            "." + os.path.basename(good_path) + "__staging",
        )
    )

    bad_path = str(tmp_path / "rejected")
    with pytest.raises(AuditFailure, match="impossible"):
        write_audit_publish(
            spark, docs, bad_path, {"impossible": lambda d: d.count() > 10**9}
        )
    assert not os.path.exists(bad_path)  # nothing published
    assert os.path.exists(  # kept for inspection, invisible to Spark
        os.path.join(
            os.path.dirname(bad_path),
            "." + os.path.basename(bad_path) + "__staging",
        )
    )
