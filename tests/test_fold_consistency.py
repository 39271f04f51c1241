"""Leg-vs-standalone consistency for the round-7 union folds.

Each hard-graded union leg absorbed a standalone registered query. The
graded oracle guards the LEG and the standalone's own pytest oracle
guards the STANDALONE — but nothing else ties the two code paths
together, so a future edit to one could silently diverge from the
other. These tests pin leg == standalone directly (the
test_text_stats_lang_leg_matches_standalone precedent), so the pair
can only move in lockstep.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_ready_data_framework_spark.registry import QUERIES


def _leg(spark, sf, union_name: str, tag_col: str, tag: str):
    df = QUERIES[union_name](spark, sf)
    return df.filter(F.col(tag_col) == tag)


def test_sample_quality_leg_matches_standalone(spark, sf_smoke):
    """q_sample_stratified's quality leg freezes the SAME doc set as
    q_sample_quality (both run qsample_gate, but through different
    plan shapes: tagged-explode filter vs plain projection filter)."""
    leg = {
        (r.doc_id, r.source)
        for r in _leg(
            spark, sf_smoke, "q_sample_stratified", "sample_kind", "quality"
        ).collect()
    }
    standalone = {
        (r.doc_id, r.source)
        for r in QUERIES["q_sample_quality"](spark, sf_smoke).collect()
    }
    assert leg == standalone and leg


def test_perplexity_leg_matches_standalone(spark, sf_smoke):
    """q_text_quality's perplexity leg carries q_perplexity's numbers
    verbatim (score = perplexity)."""
    leg = {
        (r.doc_id, r.n_bigrams, r.avg_logp, r.score)
        for r in _leg(
            spark, sf_smoke, "q_text_quality", "quality_kind", "perplexity"
        ).collect()
    }
    standalone = {
        (r.doc_id, r.n_bigrams, r.avg_logp, r.perplexity)
        for r in QUERIES["q_perplexity"](spark, sf_smoke).collect()
    }
    assert leg == standalone and leg


def test_tfidf_leg_matches_standalone(spark, sf_smoke):
    """q_token_bpe's tfidf leg (key = "<doc_id> <term>") carries
    q_tfidf_topterms' per-doc top-K: same (doc, term, rank, score)
    sets; the leg's n_docs is the term's df and n_tokens the in-doc
    tf, both recoverable from the standalone's corpus_tf path only via
    the shared counts frame — so compare the identifying columns."""
    leg = set()
    for r in _leg(
        spark, sf_smoke, "q_token_bpe", "token_kind", "tfidf"
    ).collect():
        doc_id, term = r.key.split(" ", 1)
        leg.add((int(doc_id), term, r.rank, r.tfidf))
    standalone = {
        (r.doc_id, r.term, r.rn, r.score)
        for r in QUERIES["q_tfidf_topterms"](spark, sf_smoke).collect()
    }
    assert leg == standalone and leg


def test_length_bucket_leg_matches_standalone(spark, sf_smoke):
    leg = {
        (r.grp, r.bin, r.n_rows, r.real_tokens, r.padded_tokens, r.waste_frac)
        for r in _leg(
            spark, sf_smoke, "q_histogram_bins", "method", "length_bucket"
        ).collect()
    }
    standalone = {
        (r.scheme, r.bucket, r.n_docs, r.real_tokens, r.padded_tokens, r.waste_frac)
        for r in QUERIES["q_length_buckets"](spark, sf_smoke).collect()
    }
    assert leg == standalone and leg


def test_corr_leg_matches_standalone(spark, sf_smoke):
    leg = {
        (r.col_name, r.col_b, r.pearson_r, r.n_rows)
        for r in _leg(
            spark, sf_smoke, "q_profile", "profile_kind", "corr"
        ).collect()
    }
    standalone = {
        (r.col_a, r.col_b, r.pearson_r, r.n_rows)
        for r in QUERIES["q_corr_matrix"](spark, sf_smoke).collect()
    }
    assert leg == standalone and leg


def test_keyskew_leg_matches_standalone_summary(spark, sf_smoke):
    """q_profile's keyskew leg == the summary columns every
    q_skew_profile row carries (the standalone adds the top-K key
    rows the summary leg deliberately leaves to pytest). The graded
    p50/p99 are the exact type-1 RANK statistics (r8) — pinned to the
    standalone's p50_rank/p99_rank; the standalone's interpolated
    p50_cnt/p99_cnt must bracket-agree with the rank form (an order
    statistic is within one group-size step of the interpolation)."""
    (leg,) = _leg(
        spark, sf_smoke, "q_profile", "profile_kind", "keyskew"
    ).collect()
    sk = QUERIES["q_skew_profile"](spark, sf_smoke).collect()[0]
    assert (
        leg.n_distinct,
        leg.max_group,
        leg.p50_group,
        leg.p99_group,
        leg.skew_factor,
    ) == (sk.n_keys, sk.max_cnt, float(sk.p50_rank), float(sk.p99_rank), sk.skew_factor)
    # the two quantile flavors may differ only by interpolation inside
    # one inter-order-statistic gap
    assert abs(sk.p50_rank - sk.p50_cnt) <= 1.0
    assert abs(sk.p99_rank - sk.p99_cnt) <= 1.0


def test_ht_leg_matches_standalone(spark, sf_smoke):
    """q_text_stats' ht leg == q_ht_estimate per source. chars compare
    only when the declared n_chars column equals length(text) on the
    fixture (the documented divergence); the doc-count and n_hat
    columns must ALWAYS agree (same gate, same weights)."""
    from ai_ready_data_framework_spark.io import load_table

    leg = {
        r.source: (r.n_docs, r.n_sampled, r.n_hat, r.chars_true, r.chars_hat)
        for r in _leg(
            spark, sf_smoke, "q_text_stats", "stat_kind", "ht"
        ).collect()
    }
    standalone = {
        r.source: (r.n_true, r.n_sampled, r.n_hat, r.chars_true, r.chars_hat)
        for r in QUERIES["q_ht_estimate"](spark, sf_smoke).collect()
    }
    assert set(leg) == set(standalone) and leg
    docs = load_table(spark, sf_smoke, "documents")
    chars_match = (
        docs.filter(F.col("n_chars") != F.length("text")).limit(1).count() == 0
    )
    for src, l in leg.items():
        s = standalone[src]
        assert l[:3] == s[:3], (src, l, s)
        if chars_match:
            assert l == s, (src, l, s)


def test_skew_join_leg_matches_standalone(spark, sf_smoke):
    """Since r8 this pin is CROSS-STRATEGY: the graded leg runs the
    brute replicate-everything rewrite while the standalone defaults
    to the production hot_split two-path form — equality here proves
    both rewrites produce the identical aggregate (each is separately
    proven equal to the plain join by its oracle)."""
    leg = {
        (r.grp, r.n, r.amount)
        for r in _leg(
            spark, sf_smoke, "q_join_inner", "strategy", "salted_replicated"
        ).collect()
    }
    standalone = {
        (f"{r.l_returnflag}/{r.o_orderstatus}", r.n_items, r.sum_price)
        for r in QUERIES["q_join_skew"](spark, sf_smoke).collect()
    }
    assert leg == standalone and leg


def test_mix_temperature_leg_matches_standalone(spark, sf_smoke):
    """q_sample_stratified's mix_temperature leg == q_mix_temperature
    (r8 fold — the fixed-point pow ladder unblocked it, VERDICT r7
    #2)."""
    leg = {
        (r.source, r.n_docs, r.natural_share, r.mix_weight,
         r.expected_docs, r.oversample_factor)
        for r in _leg(
            spark, sf_smoke, "q_sample_stratified", "sample_kind",
            "mix_temperature",
        ).collect()
    }
    standalone = {
        tuple(r)
        for r in QUERIES["q_mix_temperature"](spark, sf_smoke).collect()
    }
    assert leg == standalone and leg


def test_mix_budget_leg_matches_standalone(spark, sf_smoke):
    """q_sample_stratified's mix_budget leg == q_mix_budget (r8
    fold)."""
    leg = {
        (r.source, r.n_docs, r.n_tokens, r.natural_share, r.mix_weight,
         r.tokens_needed, r.epochs, r.upsampled)
        for r in _leg(
            spark, sf_smoke, "q_sample_stratified", "sample_kind",
            "mix_budget",
        ).collect()
    }
    standalone = {
        tuple(r) for r in QUERIES["q_mix_budget"](spark, sf_smoke).collect()
    }
    assert leg == standalone and leg


# ---------------------------------------------------------------------------
# r8 (VERDICT r7 #5): direct pins for the seventh/eighth-wave folds,
# previously tied to their standalones only transitively through two
# exact oracles of the same math.
# ---------------------------------------------------------------------------


def test_zscore_leg_matches_standalone(spark, sf_smoke):
    """q_window_lag's zscore leg == q_anomaly_zscore: same flagged
    events, same rounded z."""
    leg = {
        (r.event_id, r.value)
        for r in _leg(
            spark, sf_smoke, "q_window_lag", "metric", "zscore"
        ).collect()
    }
    standalone = {
        (r.event_id, r.z)
        for r in QUERIES["q_anomaly_zscore"](spark, sf_smoke).collect()
    }
    assert leg == standalone and leg


def test_entropy_leg_matches_standalone(spark, sf_smoke):
    """q_token_bpe's doc_entropy leg == q_token_entropy per doc."""
    leg = {
        (int(r.key), r.n_tokens, r.n_unique, r.entropy, r.entropy_norm)
        for r in _leg(
            spark, sf_smoke, "q_token_bpe", "token_kind", "doc_entropy"
        ).collect()
    }
    standalone = {
        tuple(r) for r in QUERIES["q_token_entropy"](spark, sf_smoke).collect()
    }
    assert leg == standalone and leg


def test_datacard_leg_matches_standalone(spark, sf_smoke):
    """q_text_stats' datacard leg == q_datacard on every column the
    two schemas share (the leg adds max_tokens on top)."""
    cols = (
        "n_docs", "n_dup_docs", "dup_frac", "total_tokens", "avg_tokens",
        "avg_chars", "n_langs", "top_lang", "top_lang_share",
    )
    leg = {
        r.source: tuple(r[c] for c in cols)
        for r in _leg(
            spark, sf_smoke, "q_text_stats", "stat_kind", "datacard"
        ).collect()
    }
    standalone = {
        r.source: tuple(r[c] for c in cols)
        for r in QUERIES["q_datacard"](spark, sf_smoke).collect()
    }
    assert leg == standalone and leg


def test_dedup_lines_leg_matches_standalone(spark, sf_smoke):
    """q_dedup_exact's lines leg == q_dedup_lines: same per-doc block
    accounting and the leg's cleaned_sha is sha2-256 of the
    standalone's reassembled cleaned_text."""
    import hashlib

    leg = {
        (r.keep_doc_id, r.n_blocks, r.n_kept, r.cleaned_sha)
        for r in _leg(
            spark, sf_smoke, "q_dedup_exact", "dedup_kind", "lines"
        ).collect()
    }
    standalone = {
        (
            r.doc_id,
            r.n_blocks,
            r.n_kept,
            hashlib.sha256(r.cleaned_text.encode()).hexdigest(),
        )
        for r in QUERIES["q_dedup_lines"](spark, sf_smoke).collect()
    }
    assert leg == standalone and leg


def test_src_divergence_leg_matches_standalone(spark, sf_smoke):
    """q_token_bpe's src_divergence leg == q_source_divergence on the
    shared per-source divergence columns."""
    leg = {
        r.key: (r.n_tokens, r.kl_vs_corpus, r.js_vs_corpus)
        for r in _leg(
            spark, sf_smoke, "q_token_bpe", "token_kind", "src_divergence"
        ).collect()
    }
    standalone = {
        r.source: (r.n_tokens, r.kl_vs_corpus, r.js_vs_corpus)
        for r in QUERIES["q_source_divergence"](spark, sf_smoke).collect()
    }
    assert leg == standalone and leg


def test_pmi_leg_matches_standalone(spark, sf_smoke):
    """q_token_bpe's pmi leg (key = "a b") == q_cooccur_pmi's ranked
    pairs."""
    leg = {
        (r.key, r.n_tokens, r.pmi)
        for r in _leg(
            spark, sf_smoke, "q_token_bpe", "token_kind", "pmi"
        ).collect()
    }
    standalone = {
        (f"{r.a} {r.b}", r.c_ab, r.pmi)
        for r in QUERIES["q_cooccur_pmi"](spark, sf_smoke).collect()
    }
    assert leg == standalone and leg


def test_mix_schedule_leg_matches_standalone(spark, sf_smoke):
    """q_sample_stratified's schedule leg == q_mix_schedule (r8 fold —
    it never used pow and was rows-only purely for slot mechanics)."""
    leg = {
        (r.doc_id, r.source, r.sample_rank, r.progress)
        for r in _leg(
            spark, sf_smoke, "q_sample_stratified", "sample_kind", "schedule"
        ).collect()
    }
    standalone = {
        (r.doc_id, r.source, r.rank_in_source, r.progress)
        for r in QUERIES["q_mix_schedule"](spark, sf_smoke).collect()
    }
    assert leg == standalone and leg


def test_dedup_spans_leg_matches_standalone(spark, sf_smoke):
    """q_dedup_exact's spans leg == q_dedup_spans (r11 fold, VERDICT
    r10 #2): the leg's token accounting must reconcile with the
    standalone report — n_blocks is the doc's token count and
    n_blocks - n_kept its duplicated-token total — and the leg's
    cleaned_sha must be sha2-256 of the strip_duplicated_spans
    rebuild re-derived here from the standalone pipeline."""
    import hashlib

    from ai_ready_data_framework_spark.io import load_table
    from ai_ready_data_framework_spark.operators.ai import (
        SPAN_MIN_RUN,
        duplicated_spans,
        strip_duplicated_spans,
    )

    leg = {
        r.keep_doc_id: (r.n_blocks, r.n_kept, r.cleaned_sha)
        for r in _leg(
            spark, sf_smoke, "q_dedup_exact", "dedup_kind", "spans"
        ).collect()
    }
    standalone = {
        r.doc_id: (r.n_tokens, r.n_tokens - r.dup_tokens)
        for r in QUERIES["q_dedup_spans"](spark, sf_smoke).collect()
    }
    assert standalone  # the fixture corpus contains exact duplicates
    # every doc with spans reconciles exactly with the standalone
    for doc_id, (n_tokens, n_kept) in standalone.items():
        assert leg[doc_id][:2] == (n_tokens, n_kept), doc_id
    # docs absent from the standalone report have nothing stripped
    for doc_id, (n_blocks, n_kept, _) in leg.items():
        if doc_id not in standalone:
            assert n_kept == n_blocks, doc_id
    # and the leg's sha is the rebuild's sha, re-derived independently
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    spans = duplicated_spans(docs, min_run=SPAN_MIN_RUN, keep="first")
    rebuilt = {
        r.doc_id: hashlib.sha256(r.text_clean.encode()).hexdigest()
        for r in strip_duplicated_spans(docs, spans).collect()
    }
    assert {d: sha for d, (_, _, sha) in leg.items()} == rebuilt


def test_contamination_spans_leg_matches_standalone(spark, sf_smoke):
    """q_contamination's exact_spans leg == q_decontam_spans (r11
    seventeenth fold): identical per-train-doc span accounting, with
    the leg adding only the doc's token count and the derived leaked
    fraction."""
    leg = {
        r.doc_id: (r.n_spans, r.n_hit, r.max_span_tokens)
        for r in _leg(
            spark, sf_smoke, "q_contamination", "contam_kind", "exact_spans"
        ).collect()
    }
    standalone = {
        r.doc_id: (r.n_spans, r.leaked_tokens, r.max_span_tokens)
        for r in QUERIES["q_decontam_spans"](spark, sf_smoke).collect()
    }
    assert leg == standalone and leg
    # and the shingle leg is byte-stable against the pre-fold shape:
    # one row per eval-fold doc, hits never exceed units
    sh = _leg(
        spark, sf_smoke, "q_contamination", "contam_kind", "shingle_set"
    ).collect()
    assert sh and all(r.doc_id % 10 == 0 for r in sh)
    assert all(0 <= r.n_hit <= r.n_units for r in sh)
