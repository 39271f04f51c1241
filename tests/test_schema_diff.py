"""schema_diff (r10 — VERDICT r9 missing #2): column-level diffing of
two schema versions — DuckDB oracle for the declared query's
classification logic, plus the nested-struct and nullability edges the
fixture evolution can't produce."""

from __future__ import annotations

import duckdb
from pyspark.sql.types import StructType

from ai_ready_data_framework_spark.operators.relational import (
    schema_diff,
    schema_field_rows,
)
from ai_ready_data_framework_spark.registry import QUERIES


def test_schema_diff_matches_duckdb_oracle(spark, sf_correctness):
    """The full-outer classification must agree with an independent
    DuckDB implementation fed the SAME flattened field rows (the
    flattening itself is pinned by the edge tests below)."""
    from ai_ready_data_framework_spark.io import load_table

    old_rows = schema_field_rows(
        load_table(spark, sf_correctness, "orders").schema
    )
    got = {
        tuple(r)
        for r in QUERIES["q_schema_diff"](spark, sf_correctness).collect()
    }
    # rebuild the evolved side exactly as the query declares it
    new_rows = []
    for name, typ, nullable in old_rows:
        if name == "o_orderpriority":
            continue
        if name == "o_custkey":
            new_rows.append((name, "string", nullable))
        elif name == "o_orderstatus":
            new_rows.append((name, typ, not nullable))
        else:
            new_rows.append((name, typ, nullable))
    new_rows.append(("o_discount", "double", True))

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE o(col_name VARCHAR, old_type VARCHAR, old_nullable BOOLEAN)"
    )
    con.execute(
        "CREATE TABLE n(col_name VARCHAR, new_type VARCHAR, new_nullable BOOLEAN)"
    )
    con.executemany("INSERT INTO o VALUES (?,?,?)", old_rows)
    con.executemany("INSERT INTO n VALUES (?,?,?)", new_rows)
    expected = {
        tuple(r)
        for r in con.execute(
            """
        SELECT COALESCE(o.col_name, n.col_name) AS col_name,
               CASE WHEN o.old_type IS NULL THEN 'added'
                    WHEN n.new_type IS NULL THEN 'removed'
                    WHEN o.old_type != n.new_type THEN 'type_changed'
                    WHEN o.old_nullable != n.new_nullable
                         THEN 'nullability_changed'
                    ELSE 'unchanged' END AS change_kind,
               o.old_type, n.new_type, o.old_nullable, n.new_nullable
        FROM o FULL OUTER JOIN n USING (col_name)
        """
        ).fetchall()
    }
    assert got == expected
    kinds = {r[1] for r in got}
    # every change kind must actually occur, or the evolution tests
    # nothing
    assert kinds == {
        "added",
        "removed",
        "type_changed",
        "nullability_changed",
        "unchanged",
    }


def test_schema_diff_nested_struct_paths(spark):
    """A type change three levels down surfaces at its own dotted
    path; the enclosing struct rows stay 'unchanged'; a struct
    replaced by an atomic type reads type_changed at the struct path
    with its children 'removed'."""
    old = StructType.fromDDL(
        "id bigint, meta struct<geo: struct<lat: double, lon: double>, v: int>, s struct<a: int>"
    )
    new = StructType.fromDDL(
        "id bigint, meta struct<geo: struct<lat: float, lon: double>, v: int>, s string"
    )
    rows = {
        r.col_name: (r.change_kind, r.old_type, r.new_type)
        for r in schema_diff(spark, old, new).collect()
    }
    assert rows["meta.geo.lat"] == ("type_changed", "double", "float")
    assert rows["meta.geo.lon"][0] == "unchanged"
    assert rows["meta.geo"][0] == "unchanged"
    assert rows["meta"][0] == "unchanged"
    assert rows["s"] == ("type_changed", "struct", "string")
    assert rows["s.a"][0] == "removed"


def test_schema_diff_type_change_dominates_nullability(spark):
    """When both the type and the nullability move, the kind is
    type_changed (what breaks readers) — the nullability flip stays
    visible in the old/new_nullable columns."""
    from pyspark.sql.types import IntegerType, LongType, StructField

    old = StructType([StructField("x", IntegerType(), True)])
    new = StructType([StructField("x", LongType(), False)])
    (r,) = schema_diff(spark, old, new).collect()
    assert r.change_kind == "type_changed"
    assert (r.old_nullable, r.new_nullable) == (True, False)


def test_schema_diff_array_element_change_is_column_type_change(spark):
    """Arrays compare by their full type string — an element-type
    change reads as a type change of the column (how every consumer
    experiences it)."""
    old = StructType.fromDDL("v array<float>")
    new = StructType.fromDDL("v array<double>")
    (r,) = schema_diff(spark, old, new).collect()
    assert r.change_kind == "type_changed"
    assert (r.old_type, r.new_type) == ("array<float>", "array<double>")


def test_schema_diff_identical_schemas_all_unchanged(spark, sf_correctness):
    from ai_ready_data_framework_spark.io import load_table

    s = load_table(spark, sf_correctness, "documents").schema
    out = schema_diff(spark, s, StructType.fromJson(s.jsonValue()))
    assert {r.change_kind for r in out.collect()} == {"unchanged"}


def test_schema_compatibility_audit_gates_publish(spark, tmp_path):
    """The write-side half (r10): write_audit_publish with the
    schema_compatibility_audit must let additive evolution through and
    REJECT a dropped column before any reader can observe it."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from ai_ready_data_framework_spark.sources.maintenance import (
        AuditFailure,
        schema_compatibility_audit,
        write_audit_publish,
    )

    base = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    # the reference version is the archived schema of PUBLISHED data
    # (parquet-normalized nullability), not an in-memory plan's schema
    # — an in-memory range() is non-nullable while every parquet
    # read-back is nullable, which would read as nullability_changed
    base.write.parquet(str(tmp_path / "v1"))
    base = spark.read.parquet(str(tmp_path / "v1"))
    reference = base.schema
    # additive evolution publishes
    added = base.withColumn("w", F.lit("x"))
    out = str(tmp_path / "asset")
    write_audit_publish(
        spark,
        added,
        out,
        {"schema": schema_compatibility_audit(spark, reference)},
    )
    assert spark.read.parquet(out).count() == 20
    # a dropped column is rejected and the live data stays intact
    with _pytest.raises(AuditFailure):
        write_audit_publish(
            spark,
            base.drop("v"),
            out,
            {"schema": schema_compatibility_audit(spark, reference)},
        )
    assert set(spark.read.parquet(out).columns) == {"k", "v", "w"}
    # ...unless the migration is explicit
    write_audit_publish(
        spark,
        base.drop("v"),
        out,
        {
            "schema": schema_compatibility_audit(
                spark, reference, allow=("added", "removed")
            )
        },
    )
    assert set(spark.read.parquet(out).columns) == {"k"}


def test_schema_history_log_folds_consecutive_versions(spark):
    """Three archived versions -> two transitions, each change tagged
    with its transition ids; unchanged columns never appear."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ai_ready_data_framework_spark.operators.relational import (
        schema_history_log,
    )

    v1 = StructType(
        [
            StructField("k", LongType(), False),
            StructField("v", DoubleType(), True),
        ]
    )
    v2 = StructType(  # adds s
        [*v1.fields, StructField("s", StringType(), True)]
    )
    v3 = StructType(  # re-types v, flips s nullability
        [
            StructField("k", LongType(), False),
            StructField("v", StringType(), True),
            StructField("s", StringType(), False),
        ]
    )
    # round-trip through the stored artifact form
    versions = [
        (vid, StructType.fromJson(s.jsonValue()))
        for vid, s in (("g1", v1), ("g2", v2), ("g3", v3))
    ]
    rows = {
        (r.from_version, r.to_version, r.col_name, r.change_kind)
        for r in schema_history_log(spark, versions).collect()
    }
    assert rows == {
        ("g1", "g2", "s", "added"),
        ("g2", "g3", "v", "type_changed"),
        ("g2", "g3", "s", "nullability_changed"),
    }

    import pytest as _pytest

    with _pytest.raises(ValueError, match="2 versions"):
        schema_history_log(spark, versions[:1])


def test_q_schema_history_expected_log(spark, sf_correctness):
    rows = {
        (r.from_version, r.to_version, r.col_name, r.change_kind)
        for r in QUERIES["q_schema_history"](spark, sf_correctness)
        .collect()
    }
    assert rows == {
        ("v1", "v2", "o_discount", "added"),
        ("v2", "v3", "o_custkey", "type_changed"),
        ("v2", "v3", "o_orderstatus", "nullability_changed"),
    }
