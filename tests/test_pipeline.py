"""Full-funnel DuckDB oracle for q_pipeline_e2e (operators/pipeline.py):
an independent engine recomputes every stage — quality battery, sha256
dedup group-pick, 8-gram decontamination, md5 mixture thresholds — and
the per-stage (rows_in, rows_out, keep_frac) funnel must match exactly."""

from __future__ import annotations

import duckdb

from ai_ready_data_framework_spark.io import table_path
from ai_ready_data_framework_spark.operators import pipeline as P
from ai_ready_data_framework_spark.operators import quality as Q
from ai_ready_data_framework_spark.operators import ai as A
from ai_ready_data_framework_spark.operators.ai import (
    EVAL_FOLD_MOD,
    MIX_DEFAULT_WEIGHT,
    MIX_WEIGHTS,
    mix_threshold_hex,
)
from ai_ready_data_framework_spark.registry import QUERIES


def _funnel_oracle_sql(sf: str) -> str:
    mix_case = " ".join(
        f"WHEN source = '{src}' THEN '{mix_threshold_hex(w)}'"
        for src, w in MIX_WEIGHTS.items()
    )
    k = P.DECONTAM_SHINGLE_K
    return f"""
        WITH docs AS (
            SELECT doc_id, source, text,
                   string_split(text, ' ') AS words
            FROM read_parquet('{table_path(sf, "documents")}')
        ),
        sh_raw AS (
            SELECT DISTINCT doc_id,
                   array_to_string(words[i : i + {k - 1}], ' ') AS s
            FROM (
                SELECT doc_id, words,
                       unnest(range(1, greatest(len(words) - {k - 1}, 1) + 1)) AS i
                FROM docs
            )
        ),
        -- posting cap (VERDICT r5 #1): boilerplate shingles above
        -- least(frac * n_docs, abs) postings generate no candidates
        rare AS (
            SELECT s FROM sh_raw GROUP BY s
            HAVING COUNT(*) <= LEAST(
                {A.MAX_SHINGLE_DF_FRACTION} * (SELECT COUNT(*) FROM docs),
                {A.MAX_SHINGLE_DF_ABS})
        ),
        sh_dup AS (SELECT sh_raw.* FROM sh_raw SEMI JOIN rare USING (s)),
        dup_drop AS (
            SELECT DISTINCT b.doc_id
            FROM sh_dup a JOIN sh_dup b ON a.s = b.s AND a.doc_id < b.doc_id
        ),
        deduped AS (
            SELECT d.* FROM docs d ANTI JOIN dup_drop x ON d.doc_id = x.doc_id
        ),
        quality AS (
            SELECT * FROM deduped
            WHERE len(words) BETWEEN {Q.GOPHER_MIN_WORDS} AND {Q.GOPHER_MAX_WORDS}
              AND ROUND((length(text) - (len(words) - 1)) / len(words), 4)
                  BETWEEN {Q.GOPHER_MIN_MEAN_WORD_LEN} AND {Q.GOPHER_MAX_MEAN_WORD_LEN}
              AND len(list_filter(words, x -> x IN ('the', 'a')))
                  >= {Q.GOPHER_MIN_STOP_HITS}
              AND ROUND(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                        / greatest(length(text), 1), 4) <= {Q.GOPHER_MAX_SYMBOL_RATIO}
              AND ROUND(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
                        / greatest(len(words), 1), 4)
                  >= {Q.GOPHER_MIN_ALPHA_WORD_FRAC}
        ),
        -- eval shingles come from the RAW eval fold (docs dropped by
        -- dedup/quality still decontaminate the training set)
        eval_sh AS (
            SELECT DISTINCT s FROM sh_raw
            WHERE doc_id % {EVAL_FOLD_MOD} = 0
        ),
        shingled AS (
            SELECT DISTINCT doc_id,
                   array_to_string(words[i : i + {k - 1}], ' ') AS s
            FROM (
                SELECT doc_id, words,
                       unnest(range(1, greatest(len(words) - {k - 1}, 1) + 1)) AS i
                FROM quality
                WHERE doc_id % {EVAL_FOLD_MOD} <> 0
            )
        ),
        leaked AS (
            SELECT DISTINCT sh.doc_id
            FROM shingled sh SEMI JOIN eval_sh e ON sh.s = e.s
        ),
        clean AS (
            SELECT q.* FROM quality q
            ANTI JOIN leaked l ON q.doc_id = l.doc_id
            WHERE q.doc_id % {EVAL_FOLD_MOD} <> 0
        ),
        mixed AS (
            SELECT * FROM clean
            WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                  < (CASE {mix_case} ELSE '{mix_threshold_hex(MIX_DEFAULT_WEIGHT)}' END)
        ),
        funnel(stage, rows_in, rows_out) AS (
            SELECT '1_dedup_near', (SELECT COUNT(*) FROM docs),
                   (SELECT COUNT(*) FROM deduped)
            UNION ALL
            SELECT '2_quality', (SELECT COUNT(*) FROM deduped),
                   (SELECT COUNT(*) FROM quality)
            UNION ALL
            SELECT '3_decontam', (SELECT COUNT(*) FROM quality),
                   (SELECT COUNT(*) FROM clean)
            UNION ALL
            SELECT '4_mix', (SELECT COUNT(*) FROM clean),
                   (SELECT COUNT(*) FROM mixed)
        )
        SELECT stage, CAST(rows_in AS BIGINT) AS rows_in,
               CAST(rows_out AS BIGINT) AS rows_out,
               ROUND(rows_out / rows_in, 4) AS keep_frac
        FROM funnel ORDER BY stage
    """


def test_pipeline_funnel_matches_duckdb_oracle(spark, sf_correctness):
    expected = [
        tuple(r)
        for r in duckdb.connect().execute(_funnel_oracle_sql(sf_correctness)).fetchall()
    ]
    rows = [tuple(r) for r in QUERIES["q_pipeline_e2e"](spark, sf_correctness).collect()]
    assert rows == expected
    # every stage must actually discriminate on this corpus: strictly
    # fewer rows out than in at quality, dedup, decontam, and mix
    by_stage = {r[0]: r for r in rows}
    assert len(by_stage) == 4
    for stage, (_, rows_in, rows_out, frac) in by_stage.items():
        assert 0 < rows_out < rows_in, (stage, rows_in, rows_out)
        assert 0.0 < frac < 1.0
    # stages chain: rows_out of each stage == rows_in of the next,
    # except decontam whose input is deduped (eval docs leave there)
    assert by_stage["1_dedup_near"][2] == by_stage["2_quality"][1]
    assert by_stage["2_quality"][2] == by_stage["3_decontam"][1]
    assert by_stage["3_decontam"][2] == by_stage["4_mix"][1]


def test_dup_drop_posting_cap_bounds_boilerplate(spark):
    """VERDICT r5 #1 adversarial fixture: one boilerplate 8-gram shared
    by hundreds of docs must generate ZERO candidates (its posting list
    exceeds the df cap), while genuine near-dups sharing a RARE 8-gram
    are still dropped. Also pins the candidate-volume bounds: the cap
    removes the hot shingle's df^2 pair mass from the declarative pair
    rule (which the DuckDB funnel oracle still states), and the shipped
    min-join implementation's join volume is the sub-cap POSTINGS —
    O(postings), never O(df^2) at all."""
    import pyspark.sql.functions as F

    from ai_ready_data_framework_spark.operators import ai as A
    from ai_ready_data_framework_spark.operators import pipeline as P

    boiler = "this content is licensed under the example license"  # 8 tokens+1
    n_boiler = 300
    rows = [
        # boilerplate header + unique tail: NOT copies of each other
        (i, boiler + f" unique tail {i} alpha beta gamma delta epsilon")
        for i in range(n_boiler)
    ]
    # one genuine near-dup pair sharing a rare 8-gram
    shared = "rare shared sentence of exactly eight tokens here"
    rows += [
        (1000, shared + " first variant ending one two three four five"),
        (1001, shared + " second variant close six seven eight nine ten"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    n_docs = docs.count()
    # cap = least(0.2 * 302, 500) = 60.4 -> the 300-wide posting is out
    sh = P.doc_shingles(docs)
    dropped = {r.doc_id for r in P.dup_drop_ids(sh, n_docs).collect()}
    # the larger-id member of the genuine pair is dropped; boilerplate
    # sharers all survive
    assert dropped == {1001}
    # candidate-volume pin: rebuild the capped join's candidate count
    # and the uncapped one — the cap must remove the quadratic mass
    cap = min(A.MAX_SHINGLE_DF_FRACTION * n_docs, A.MAX_SHINGLE_DF_ABS)
    df_by_s = sh.groupBy("s").agg(F.count("*").alias("df"))
    capped_cands = (
        df_by_s.filter(F.col("df") <= cap)
        .agg(F.sum(F.col("df") * F.col("df")))
        .first()[0]
    )
    uncapped_cands = df_by_s.agg(F.sum(F.col("df") * F.col("df"))).first()[0]
    assert uncapped_cands - capped_cands >= n_boiler * n_boiler  # hot mass gone
    assert capped_cands <= cap * sh.count()  # O(df_cap * postings) bound
    # shipped min-join shape: its join volume is exactly the sub-cap
    # postings (strictly <= all postings) — no pair generation anywhere
    sub_cap_postings = (
        sh.join(
            df_by_s.filter(F.col("df") <= cap).select("s"), "s", "left_semi"
        ).count()
    )
    assert sub_cap_postings <= sh.count()
    # plan pin: the capped dup subtree contains the (min, df) aggregate
    # + filter (the cap cannot silently fall out of the plan)
    plan = P.dup_drop_ids(sh, n_docs)._jdf.queryExecution().optimizedPlan().toString()
    assert "count(1)" in plan and "df" in plan and "min(doc_id" in plan


def test_funnel_empty_stage_yields_null_keep_frac(spark, tmp_path):
    """r13 regression: a corpus whose quality gate drops EVERY document
    hands the decontamination stage rows_in = 0, and keep_frac's 0/0
    must be NULL, not an ANSI DIVIDE_BY_ZERO. Before the LocalRelation
    return (io.local_df) this was latent — count() pruned the division
    out of the pickled-RDD projection — but constant folding now
    evaluates the projection for ANY action, which is how the sf1
    scale smoke's synthetic corpus (no stopwords, so zero Gopher
    passes) exposed it."""
    from pyspark.sql import functions as F

    # 40 docs of stopword-free tokens: every Gopher stop-hits rule
    # fails, so stage 2 keeps nothing and stages 3-4 see rows_in = 0
    docs = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.array(*[F.concat(F.lit("zq"), F.lit(i)) for i in range(30)]),
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        F.lit(0).cast("long").alias("n_chars"),
    )
    out = str(tmp_path / "empty_corpus")
    docs.write.parquet(f"{out}/documents.parquet")
    rows = {r["stage"]: r for r in QUERIES["q_pipeline_e2e"](spark, out).collect()}
    assert rows["2_quality"].rows_out == 0
    assert rows["3_decontam"].rows_in == 0
    assert rows["3_decontam"].keep_frac is None
    assert rows["4_mix"].keep_frac is None
    # the non-empty stage still reports a real fraction
    assert rows["1_dedup_near"].keep_frac is not None
