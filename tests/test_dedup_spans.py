"""Duplicated-span (repeated-substring / ExactSubstr) dedup — full
DuckDB oracle for the declared query (the whole pipeline replicated in
SQL: grams -> hash stats -> canonical exemption -> interval merge),
plus planted-passage fixtures the word-soup corpus cannot produce
(cross-doc shared passage, within-doc self-repeat, strip roundtrip,
keep-mode validation)."""

from __future__ import annotations

import os

import duckdb
import pytest

from ai_ready_data_framework_spark.io import table_path
from ai_ready_data_framework_spark.operators.ai import (
    SPAN_MIN_RUN,
    duplicated_spans,
    strip_duplicated_spans,
)
from ai_ready_data_framework_spark.registry import QUERIES


def _oracle_sql(sf_dir: str, min_run: int) -> str:
    path = table_path(sf_dir, "documents")
    return f"""
        WITH d AS (
            SELECT doc_id, string_split(text, ' ') AS w
            FROM read_parquet('{path}')
        ),
        positions AS (
            SELECT doc_id, w,
                   unnest(generate_series(1, len(w) - {min_run} + 1)) AS i
            FROM d WHERE len(w) >= {min_run}
        ),
        grams AS (
            SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                   md5(array_to_string(w[i:i + {min_run} - 1], ' ')) AS h
            FROM positions
        ),
        stats AS (
            SELECT h, COUNT(*) AS occ,
                   MIN({{'d': doc_id, 'p': pos}}) AS canon
            FROM grams GROUP BY h HAVING COUNT(*) >= 2
        ),
        ints AS (
            SELECT g.doc_id, g.pos AS s, g.pos + {min_run} - 1 AS e
            FROM grams g JOIN stats st USING (h)
            WHERE NOT (g.doc_id = st.canon.d AND g.pos = st.canon.p)
        ),
        isl AS (
            SELECT doc_id, s, e,
                   CASE WHEN s > COALESCE(MAX(e) OVER (
                            PARTITION BY doc_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), -2) + 1
                        THEN 1 ELSE 0 END AS brk
            FROM ints
        ),
        isl2 AS (
            SELECT doc_id, s, e,
                   SUM(brk) OVER (PARTITION BY doc_id ORDER BY s
                                  ROWS UNBOUNDED PRECEDING) AS island
            FROM isl
        ),
        spans AS (
            SELECT doc_id, island,
                   MIN(s) AS span_start, MAX(e) AS span_end
            FROM isl2 GROUP BY 1, 2
        ),
        per_doc AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_spans,
                   CAST(SUM(span_end - span_start + 1) AS BIGINT)
                       AS dup_tokens,
                   CAST(MAX(span_end - span_start + 1) AS BIGINT)
                       AS max_span_tokens
            FROM spans GROUP BY doc_id
        )
        SELECT p.doc_id, p.n_spans, p.dup_tokens, p.max_span_tokens,
               CAST(len(d.w) AS BIGINT) AS n_tokens
        FROM per_doc p JOIN d USING (doc_id)
        ORDER BY doc_id
    """


def test_dedup_spans_matches_duckdb_oracle(spark, sf_correctness):
    expected = {
        tuple(r)
        for r in duckdb.connect()
        .execute(_oracle_sql(sf_correctness, SPAN_MIN_RUN))
        .fetchall()
    }
    got = {
        (r.doc_id, r.n_spans, r.dup_tokens, r.max_span_tokens, r.n_tokens)
        for r in QUERIES["q_dedup_spans"](spark, sf_correctness).collect()
    }
    # the fixture corpus contains exact duplicates, so span dedup must
    # actually fire or the oracle verifies an empty set
    assert got
    assert got == expected


PASSAGE = "p1 p2 p3 p4 p5 p6"


@pytest.fixture()
def planted(spark):
    return spark.createDataFrame(
        [
            (1, f"a1 a2 a3 {PASSAGE} a4 a5 a6"),
            (2, f"b1 b2 {PASSAGE} b3 b4 b5 b6"),
            (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"),
        ],
        "doc_id long, text string",
    )


def test_keep_first_exempts_canonical_copy(planted):
    spans = {
        r.doc_id: (r.span_start, r.span_end, r.span_tokens)
        for r in duplicated_spans(planted, min_run=4, keep="first").collect()
    }
    # doc 1 owns every shared gram's canonical occurrence -> clean;
    # doc 2's copy of the passage (token positions 2..7) is flagged
    # maximally; doc 3 is unique -> clean
    assert spans == {2: (2, 7, 6)}


def test_keep_none_flags_every_occurrence(planted):
    spans = {
        r.doc_id: (r.span_start, r.span_end)
        for r in duplicated_spans(planted, min_run=4, keep="none").collect()
    }
    assert spans == {1: (3, 8), 2: (2, 7)}


def test_within_doc_self_repeat(spark):
    doc = spark.createDataFrame(
        [(7, f"{PASSAGE} x1 x2 {PASSAGE}")], "doc_id long, text string"
    )
    spans = duplicated_spans(doc, min_run=4, keep="first").collect()
    assert [(r.span_start, r.span_end) for r in spans] == [(8, 13)]


def test_strip_roundtrip(planted):
    spans = duplicated_spans(planted, min_run=4, keep="first")
    out = {
        r.doc_id: r.text_clean
        for r in strip_duplicated_spans(planted, spans).collect()
    }
    assert out[1] == f"a1 a2 a3 {PASSAGE} a4 a5 a6"  # canonical copy kept
    assert out[2] == "b1 b2 b3 b4 b5 b6"  # duplicated passage stripped
    assert out[3] == "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"


def test_strip_fully_duplicated_doc_survives_empty(spark):
    docs = spark.createDataFrame(
        [(1, PASSAGE), (2, PASSAGE)], "doc_id long, text string"
    )
    spans = duplicated_spans(docs, min_run=4, keep="first")
    out = {
        r.doc_id: r.text_clean
        for r in strip_duplicated_spans(docs, spans).collect()
    }
    assert out == {1: PASSAGE, 2: ""}


def test_span_invariants_on_fixture(spark, sf_smoke):
    rows = QUERIES["q_dedup_spans"](spark, sf_smoke).collect()
    for r in rows:
        assert 1 <= r.n_spans
        assert SPAN_MIN_RUN <= r.max_span_tokens <= r.dup_tokens
        assert r.dup_tokens <= r.n_tokens


def test_keep_mode_validated(planted):
    with pytest.raises(ValueError, match="keep"):
        duplicated_spans(planted, keep="latest")


# ---------------------------------------------------------------------------
# cross-corpus exact-substring decontamination (q_decontam_spans)
# ---------------------------------------------------------------------------


def _decontam_oracle_sql(sf_dir: str, min_run: int, fold_mod: int) -> str:
    path = table_path(sf_dir, "documents")
    return f"""
        WITH d AS (
            SELECT doc_id, string_split(text, ' ') AS w
            FROM read_parquet('{path}')
        ),
        positions AS (
            SELECT doc_id, w,
                   unnest(generate_series(1, len(w) - {min_run} + 1)) AS i
            FROM d WHERE len(w) >= {min_run}
        ),
        grams AS (
            SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                   md5(array_to_string(w[i:i + {min_run} - 1], ' ')) AS h
            FROM positions
        ),
        probe AS (
            SELECT DISTINCT h FROM grams WHERE doc_id % {fold_mod} = 0
        ),
        ints AS (
            SELECT g.doc_id, g.pos AS s, g.pos + {min_run} - 1 AS e
            FROM grams g JOIN probe USING (h)
            WHERE g.doc_id % {fold_mod} <> 0
        ),
        isl AS (
            SELECT doc_id, s, e,
                   CASE WHEN s > COALESCE(MAX(e) OVER (
                            PARTITION BY doc_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), -2) + 1
                        THEN 1 ELSE 0 END AS brk
            FROM ints
        ),
        isl2 AS (
            SELECT doc_id, s, e,
                   SUM(brk) OVER (PARTITION BY doc_id ORDER BY s
                                  ROWS UNBOUNDED PRECEDING) AS island
            FROM isl
        ),
        spans AS (
            SELECT doc_id, island,
                   MIN(s) AS span_start, MAX(e) AS span_end
            FROM isl2 GROUP BY 1, 2
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(span_end - span_start + 1) AS BIGINT)
                   AS leaked_tokens,
               CAST(MAX(span_end - span_start + 1) AS BIGINT)
                   AS max_span_tokens
        FROM spans GROUP BY doc_id ORDER BY doc_id
    """


def test_decontam_spans_matches_duckdb_oracle(spark, sf_correctness):
    from ai_ready_data_framework_spark.operators.ai import EVAL_FOLD_MOD

    expected = {
        tuple(r)
        for r in duckdb.connect()
        .execute(
            _decontam_oracle_sql(sf_correctness, SPAN_MIN_RUN, EVAL_FOLD_MOD)
        )
        .fetchall()
    }
    got = {
        (r.doc_id, r.n_spans, r.leaked_tokens, r.max_span_tokens)
        for r in QUERIES["q_decontam_spans"](spark, sf_correctness).collect()
    }
    assert got  # the fixture's exact dups straddle the fold split
    assert got == expected


def test_cross_spans_flag_only_cross_corpus_overlap(spark):
    from ai_ready_data_framework_spark.operators.ai import (
        cross_duplicated_spans,
    )

    corpus = spark.createDataFrame(
        [
            (1, f"a1 a2 {PASSAGE} a3 a4"),  # contains the eval passage
            (2, "d1 d2 d3 d4 d5 d6 d7 d8"),  # train-only text
            (3, "d1 d2 d3 d4 d5 d6 d7 d8"),  # train-train dup: NOT flagged
        ],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame(
        [(100, f"e1 {PASSAGE} e2 e3")], "doc_id long, text string"
    )
    spans = {
        r.doc_id: (r.span_start, r.span_end, r.span_tokens)
        for r in cross_duplicated_spans(corpus, probe, min_run=4).collect()
    }
    # only the eval passage's copy is flagged — train-train duplication
    # is duplicated_spans' job, not decontamination's
    assert spans == {1: (2, 7, 6)}


def test_strip_preserves_null_text(spark):
    """ADVICE r10: a NULL-text document must stay NULL through the
    strip — the empty-string fallback is reserved for fully-STRIPPED
    documents, not never-tokenized ones."""
    docs = spark.createDataFrame(
        [(1, None), (2, "a1 a2 a3 a4 a5 a6 a7 a8 a9")],
        "doc_id long, text string",
    )
    spans = duplicated_spans(docs, min_run=4)
    got = {
        r.doc_id: r.text_clean
        for r in strip_duplicated_spans(docs, spans).collect()
    }
    assert got[1] is None
    assert got[2] == "a1 a2 a3 a4 a5 a6 a7 a8 a9"


def test_hot_gram_adversarial_duplication_factor(spark):
    """VERDICT r10 #3: a boilerplate passage shared by N >> 1 documents
    makes its gram hashes skewed shuffle keys in the stats groupBy and
    the join-back. The dataflow's defense is structural — the
    aggregate is map-side combinable (partials per partition, one
    hot-key row crosses) and the join-back output stays
    POSTINGS-sized (each occurrence joins exactly its one stats row;
    there is no pairwise join to go quadratic at N=300 the way a
    candidate-pair design would). Exactness at a 300x duplication
    factor, a wall bound, and a no-pairwise plan pin (the q_dedup_near
    cap precedent, functions/text.py)."""
    import time

    N = 300
    boiler = " ".join(f"b{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (d, f"u{d}x0 u{d}x1 u{d}x2 {boiler} v{d}x0 v{d}x1 v{d}x2")
            for d in range(N)
        ],
        "doc_id long, text string",
    )
    spans = duplicated_spans(docs, min_run=4, keep="first")
    t0 = time.perf_counter()
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in spans.collect()
    }
    wall = time.perf_counter() - t0
    # doc 0 owns every hot gram's canonical occurrence (min (doc, pos))
    # and keeps the passage; every other doc gets exactly the merged
    # boilerplate span [3, 12] — 10 tokens — and nothing else
    assert got == {(d, 3, 12, 10) for d in range(1, N)}
    # postings-sized, not pairs-sized: tiny data must stay fast even
    # with one gram hash carrying 300 occurrences. The structural
    # invariant is the plan pin below; the wall check is advisory and
    # only enforced on a quiet host (ADVICE r11: BASELINE.md documents
    # 2x host-noise swings, so a hard timing assert flakes under load).
    if os.getloadavg()[0] < 2.0:
        assert wall < 120.0, wall
    plan = spans._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    plan = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_null_text_parity_with_graded_oracle(spark, tmp_path):
    """ADVICE r11: the Spark spans leg keeps a NULL-text doc's
    cleaned_sha/n_chars NULL, and the q_dedup_exact DuckDB oracle must
    mirror that passthrough (it used to COALESCE to sha256('')/0 — a
    latent hash-gate mismatch the sf fixtures never exercised). Run
    the FULL graded query against the FULL graded oracle on a corpus
    that carries a NULL-text document and hash-compare, exactly as the
    driver would."""
    from ai_ready_data_framework_spark.parity import (
        compare_frames,
        duckdb_connection,
    )
    from ai_ready_data_framework_spark.registry import ORACLES

    passage = " ".join(f"p{i}" for i in range(SPAN_MIN_RUN + 2))
    # mirror the canonical documents schema (the graded query touches
    # n_chars on its raw/normalized legs)
    rows = [
        (1, None),
        (2, f"a0 a1 a2 {passage} a3"),
        (3, f"b0 b1 {passage} b2 b3"),
        (4, ""),  # empty string stays distinct from NULL
        (5, "short text"),
    ]
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        {
            "doc_id": [i for i, _ in rows],
            "text": [t for _, t in rows],
            "lang": ["en"] * len(rows),
            "source": ["test"] * len(rows),
            "n_chars": pd.array(
                [len(t) if t is not None else None for _, t in rows],
                dtype="Int64",
            ),
        }
    )
    sf_dir = str(tmp_path)
    # single-file layout, exactly like the driver's testdata
    pq.write_table(
        pa.Table.from_pandas(pdf), table_path(sf_dir, "documents")
    )
    spark_pdf = QUERIES["q_dedup_exact"](spark, sf_dir).toPandas()
    oracle_pdf = (
        duckdb_connection(sf_dir).execute(ORACLES["q_dedup_exact"]).df()
    )
    result = compare_frames("q_dedup_exact_null_text", spark_pdf, oracle_pdf)
    assert result.ok, result.detail
    spans = spark_pdf[spark_pdf.dedup_kind == "spans"].set_index("keep_doc_id")
    # the NULL-text doc passes through NULL; the empty-text doc hashes ''
    assert spans.loc[1, "cleaned_sha"] is None or spans.loc[1].isna()["cleaned_sha"]
    assert spans.loc[4, "cleaned_sha"] is not None
