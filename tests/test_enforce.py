"""Read-side governance enforcement (checks/enforce.py, VERDICT r12
#3): the purpose gate refuses undeclared purposes before any data
access, allowed purposes receive PII columns masked byte-identical to
the graded q_mask_pii output, and the field_masking /
purpose_limitation checks score 1.0 on a product whose reads route
through the enforced path — grounding the reference's factor-5
"enforced access controls" (5-compliant.md:9-13; requirements.yaml:
165-183)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_ready_data_framework_spark.checks import registries as R
from ai_ready_data_framework_spark.checks.enforce import (
    PurposeDenied,
    read_enforced,
)


def test_undeclared_purpose_refused_before_any_read(spark, sf_smoke):
    """The gate is a registry lookup — it must raise for an
    undeclared purpose (and for an uncataloged table) without
    touching data."""
    with pytest.raises(PurposeDenied, match="not permitted"):
        read_enforced(spark, sf_smoke, "documents", "ad-targeting")
    # orders permits analytics only
    with pytest.raises(PurposeDenied, match="model-training"):
        read_enforced(spark, sf_smoke, "orders", "model-training")
    # fail-closed on uncataloged assets: ungoverned data never passes
    # through unmasked
    with pytest.raises(ValueError, match="not a cataloged asset"):
        read_enforced(spark, sf_smoke, "secrets", "analytics")


def test_allowed_purpose_sees_q_mask_pii_identical_masks(
    spark, sf_correctness
):
    """An allowed consumer gets the table with every registered PII
    column replaced by sha2-256 — byte-identical, row for row, to the
    graded q_mask_pii column_hash output (the audited masking
    surface), with schema and non-PII columns untouched."""
    from ai_ready_data_framework_spark.io import load_table
    from ai_ready_data_framework_spark.registry import QUERIES

    enforced = read_enforced(
        spark, sf_correctness, "documents", "model-training"
    )
    raw = load_table(spark, sf_correctness, "documents")
    assert enforced.columns == raw.columns  # schema oblivious
    assert dict(enforced.dtypes)["text"] == "string"

    masked = (
        QUERIES["q_mask_pii"](spark, sf_correctness)
        .filter(
            (F.col("mask_kind") == "column_hash")
            & (F.col("field") == "text")
        )
        .select(F.col("rec_id").alias("doc_id"), "masked_value")
    )
    j = enforced.select("doc_id", "text").join(masked, "doc_id")
    n = j.count()
    assert n == raw.count()
    assert j.filter(F.col("text") != F.col("masked_value")).count() == 0
    # non-PII columns pass through unmasked
    lang_match = (
        enforced.select("doc_id", "lang")
        .join(raw.select("doc_id", F.col("lang").alias("raw_lang")), "doc_id")
        .filter(F.col("lang") != F.col("raw_lang"))
        .count()
    )
    assert lang_match == 0
    # ...and masking keeps referential integrity: equal plaintexts
    # hash equal (sha2 is deterministic), so the masked column still
    # joins with itself
    assert (
        enforced.select("source").distinct().count()
        == raw.select("source").distinct().count()
    )


def test_every_masked_fields_entry_is_enforced(spark, sf_smoke):
    """The registry drives the enforcement: every (table, column) in
    MASKED_FIELDS comes back sha2-masked under that table's first
    declared purpose."""
    from ai_ready_data_framework_spark.io import load_table

    for t, cols in R.MASKED_FIELDS.items():
        enforced = read_enforced(spark, sf_smoke, t, R.PURPOSES[t][0])
        raw = load_table(spark, sf_smoke, t)
        key = R.PRIMARY_KEYS[t]
        j = enforced.select(
            key, *[F.col(c).alias(f"m_{c}") for c in cols]
        ).join(raw, key)
        for c in cols:
            assert (
                j.filter(F.col(f"m_{c}") != F.sha2(F.col(c), 256)).count()
                == 0
            ), (t, c)


def test_checks_score_one_through_enforced_path(spark, sf_smoke):
    """VERDICT r12 #3 'done' criterion: field_masking and
    purpose_limitation score 1.0 on the product — the first because
    the enforced read hands out exactly the audited masks, the second
    because the refusal gate holds."""
    from ai_ready_data_framework_spark.checks.engine import (
        CheckContext,
        field_masking,
        purpose_limitation,
    )
    from ai_ready_data_framework_spark.io import load_tables

    ctx = CheckContext(
        spark=spark, sf_dir=sf_smoke, tables=load_tables(spark, sf_smoke)
    )
    assert field_masking(ctx) == 1.0
    assert purpose_limitation(ctx) == 1.0


def test_purpose_limitation_zero_when_gate_broken(
    spark, sf_smoke, monkeypatch
):
    """Declaration without a working refusal must score ZERO: simulate
    a broken gate (read path ignores the purpose registry) and the
    check collapses regardless of full registry coverage."""
    from ai_ready_data_framework_spark.checks import enforce as E
    from ai_ready_data_framework_spark.checks.engine import (
        CheckContext,
        purpose_limitation,
    )
    from ai_ready_data_framework_spark.io import load_tables

    ctx = CheckContext(
        spark=spark, sf_dir=sf_smoke, tables=load_tables(spark, sf_smoke)
    )
    monkeypatch.setattr(
        E, "read_enforced", lambda spark_, sf, t, p: ctx.tables[t]
    )
    # the engine imports inside the check body, so patch the module attr
    assert purpose_limitation(ctx) == 0.0


def test_q_read_enforced_registered_rows_only(spark, sf_smoke):
    """The governed read is a declared product-surface query: rows
    match the raw table, text comes back masked."""
    from ai_ready_data_framework_spark import registry

    registry.load_all()
    assert "q_read_enforced" in registry.QUERIES
    assert "q_read_enforced" not in registry.ORACLES  # rows-only
    out = registry.QUERIES["q_read_enforced"](spark, sf_smoke)
    raw_n = (
        spark.read.parquet(f"{sf_smoke}/documents.parquet").count()
    )
    assert out.count() == raw_n
    assert out.filter(F.length("text") != 64).count() == 0  # sha2 hex


def test_access_audit_captures_grants_and_denials(spark, sf_smoke, tmp_path):
    """The governed read's audit trail (access_audit_coverage,
    requirements.yaml:173-175): grants AND denials land as append-only
    records — the denial is written before the exception leaves, so a
    probing consumer cannot stay invisible."""
    from ai_ready_data_framework_spark.checks.enforce import (
        read_access_audit,
        read_enforced,
    )

    audit = str(tmp_path / "access_audit")
    read_enforced(
        spark, sf_smoke, "documents", "model-training", audit_dir=audit
    )
    with pytest.raises(PurposeDenied):
        read_enforced(
            spark, sf_smoke, "documents", "ad-targeting", audit_dir=audit
        )
    log = read_access_audit(spark, audit).collect()
    assert len(log) == 2
    by_decision = {r.decision: r for r in log}
    assert by_decision["granted"].purpose == "model-training"
    assert by_decision["granted"].n_masked_cols == 2  # text, source
    assert by_decision["denied"].purpose == "ad-targeting"
    assert all(r.table == "documents" and r.ts_epoch_ms > 0 for r in log)
