"""Right-to-erasure / takedown for the three persisted indexes
(sources/maintenance.py::forget_keys + the per-index wrappers): the
forgotten keys' postings must vanish from the republished base, probes
must stop matching the forgotten content, survivors must be conserved
exactly, side-artifact properties must carry over, and re-runs must be
no-ops — the DELETE half of the index lifecycle, grounding the
reference's retention_policy factor (requirements.yaml:197-199,
"defined and enforced data retention and deletion schedules")."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_ready_data_framework_spark.operators.ai import gram_postings
from ai_ready_data_framework_spark.streaming import dedup as SD
from ai_ready_data_framework_spark.streaming import spans as SS

MIN_RUN = 4


def _text(prefix: str, n: int = 10) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def _ids(spark, *vals):
    return spark.createDataFrame([(v,) for v in vals], "doc_id long")


def test_forget_documents_gram_erases_probe_matches(spark, tmp_path):
    index_docs = spark.createDataFrame(
        [(d, _text(f"base{d}_")) for d in range(1, 11)],
        "doc_id long, text string",
    )
    table = "gram_forget_test"
    index_path = str(tmp_path / "index")
    delta_dir = str(tmp_path / "deltas")
    spans_out = str(tmp_path / "spans")
    try:
        SS.write_gram_index(
            gram_postings(index_docs, min_run=MIN_RUN), table, index_path
        )
        # one ingested epoch: a copy of base doc 1 (doc 101) plus a
        # fresh text — 101's grams land in the delta, then fold
        b1 = spark.createDataFrame(
            [(101, _text("base1_")), (102, _text("u1_"))],
            "doc_id long, text string",
        )
        SS.probe_and_fold_spans(
            spark, b1, table, delta_dir, spans_out, 0, min_run=MIN_RUN
        )
        n_doc1_postings = 7 * 2  # 10-token doc, 4-gram -> 7 postings x2 docs

        # takedown: docs 1 AND its ingested copy 101 (both own base1_
        # grams — the compact-first wrapper folds 101's delta before
        # the republish so nothing survives in an epoch file)
        rep = SS.forget_documents_gram(
            spark, _ids(spark, 1, 101), table, index_path, delta_dir
        )
        assert rep["removed_rows"] == n_doc1_postings
        spark.catalog.refreshTable(table)
        assert (
            spark.table(table)
            .filter(F.col("doc_id").isin(1, 101))
            .count()
            == 0
        )
        # a NEW batch carrying the forgotten text no longer flags —
        # the content is gone, not just the rows
        probe = spark.createDataFrame(
            [(900, _text("base1_")), (901, _text("base2_"))],
            "doc_id long, text string",
        )
        got = {
            r.doc_id
            for r in SS.probe_spans(
                spark,
                gram_postings(probe, min_run=MIN_RUN),
                table,
                min_run=MIN_RUN,
            ).collect()
        }
        assert got == {901}  # base2 still matches; base1 forgotten
        # idempotent: nothing left to remove, survivors conserved
        n_after = spark.table(table).count()
        rep2 = SS.forget_documents_gram(
            spark, _ids(spark, 1, 101), table, index_path, delta_dir
        )
        assert rep2 == {"removed_rows": 0, "kept_rows": n_after}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_forget_documents_band_erases_pair_matches(spark, tmp_path):
    docs = spark.createDataFrame(
        [(d, _text(f"t{d}_", 12)) for d in range(1, 9)],
        "doc_id long, text string",
    )
    table = "band_forget_test"
    index_path = str(tmp_path / "bindex")
    delta_dir = str(tmp_path / "bdeltas")
    pairs_out = str(tmp_path / "bpairs")
    try:
        SD.write_band_index(SD.doc_bands(docs), table, index_path)
        dup = spark.createDataFrame(
            [(500, _text("t1_", 12))], "doc_id long, text string"
        )
        SD.probe_and_fold(spark, dup, table, delta_dir, pairs_out, 0)
        before = {
            (r.new_doc, r.other_doc)
            for r in spark.read.parquet(f"{pairs_out}/epoch=0").collect()
        }
        assert (500, 1) in before  # the duplicate pairs with doc 1

        SD.forget_documents_band(
            spark, _ids(spark, 1, 500), table, index_path, delta_dir
        )
        spark.catalog.refreshTable(table)
        assert (
            SD.read_band_index(spark, table)
            .filter(F.col("doc_id").isin(1, 500))
            .count()
            == 0
        )
        # the same duplicate text probed fresh finds no partner left
        SD.probe_and_fold(spark, dup, table, delta_dir, pairs_out, 1)
        after = {
            (r.new_doc, r.other_doc)
            for r in spark.read.parquet(f"{pairs_out}/epoch=1").collect()
        }
        assert not any(1 in p or 500 in p for p in after)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_forget_vectors_ivf_preserves_centroids_pointer(
    spark, sf_correctness, tmp_path
):
    from ai_ready_data_framework_spark.operators import ai
    from ai_ready_data_framework_spark.sources.maintenance import (
        read_ivf_index,
        write_ivf_index,
    )
    from ai_ready_data_framework_spark.streaming import ivf as SI

    assigned, centroids = ai.ivf_fit_assign(spark, sf_correctness)
    name = "ivf_forget_test"
    path = str(tmp_path / "ivf")
    delta_dir = str(tmp_path / "vdeltas")
    try:
        write_ivf_index(assigned, centroids, name, path)
        def _cent_set(df):
            return {
                tuple(
                    tuple(v) if isinstance(v, list) else v for v in r
                )
                for r in df.collect()
            }

        cent_before = _cent_set(read_ivf_index(spark, name, path)[1])
        n_base = spark.table(name).count()
        victims = [
            r.vec_id
            for r in spark.table(name).select("vec_id").limit(5).collect()
        ]
        ids = spark.createDataFrame([(v,) for v in victims], "vec_id long")
        rep = SI.forget_vectors_ivf(spark, ids, name, path, delta_dir)
        assert rep == {
            "removed_rows": len(victims),
            "kept_rows": n_base - len(victims),
        }
        spark.catalog.refreshTable(name)
        assert spark.table(name).count() == n_base - len(victims)
        assert (
            spark.table(name)
            .filter(F.col("vec_id").isin(victims))
            .count()
            == 0
        )
        # erasure must not detach the frozen quantizer: the resolved
        # centroid table (the idx.centroids_path property when a refit
        # set one, else the build-time default — forget_keys carries
        # idx.* properties through the republish) reads back identical
        cent_after = _cent_set(read_ivf_index(spark, name, path)[1])
        assert cent_after == cent_before
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_forget_keys_audit_failure_keeps_live_generation(spark, tmp_path):
    """A forged audit failure must leave the serving index untouched —
    forget inherits the write-audit-publish contract."""
    from ai_ready_data_framework_spark.sources import maintenance as M

    docs = spark.createDataFrame(
        [(d, _text(f"base{d}_")) for d in range(1, 6)],
        "doc_id long, text string",
    )
    table = "gram_forget_audit_test"
    index_path = str(tmp_path / "aindex")
    try:
        SS.write_gram_index(
            gram_postings(docs, min_run=MIN_RUN), table, index_path
        )
        n0 = spark.table(table).count()
        real = M.publish_bucketed_generation

        def sabotaged(spark_, df, *a, **kw):
            kw["audits"] = {"always_fails": lambda staged: False}
            return real(spark_, df, *a, **kw)

        M.publish_bucketed_generation = sabotaged
        try:
            with pytest.raises(M.AuditFailure):
                M.forget_keys(
                    spark,
                    _ids(spark, 1),
                    table,
                    index_path,
                    ("h",),
                    SS.GRAM_INDEX_BUCKETS,
                )
        finally:
            M.publish_bucketed_generation = real
        spark.catalog.refreshTable(table)
        assert spark.table(table).count() == n0  # still generation 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
