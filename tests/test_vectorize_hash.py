"""Feature-hashing vectorizer + end-to-end retrieval prep (r10).

hashed_doc_vectors is xxhash64-derived, so there is no cross-engine
value oracle (the q_dedup_simhash precedent) — the contract is pinned
by invariants instead: exact unit norm, token-duplication invariance
(integer bucket sums double exactly; 2s/||2s|| == s/||s|| in IEEE),
run-to-run bitwise determinism, and sign/bucket independence doing its
job (vectors are not axis-aligned)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ai_ready_data_framework_spark.functions.vector import (
    hashed_doc_vectors,
)
from ai_ready_data_framework_spark.registry import QUERIES


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_unit_norm_and_zero_vector(spark):
    docs = _docs(
        spark,
        [(1, "alpha beta gamma alpha"), (2, ""), (3, "solo")],
    )
    out = {r.doc_id: r for r in hashed_doc_vectors(docs, dim=16).collect()}
    # non-empty docs: exactly unit norm (IEEE ÷√ of integer sums)
    for d in (1, 3):
        n2 = sum(x * x for x in out[d].embedding)
        assert math.isclose(n2, 1.0, rel_tol=1e-12), (d, n2)
    assert out[1].n_tokens == 4 and out[3].n_tokens == 1
    # the empty doc never reaches the output (no tokens to hash) —
    # absence, not a NULL/NaN vector, is the contract
    assert 2 not in out


def test_token_duplication_is_exactly_invariant(spark):
    """Doubling every token doubles every integer bucket sum, and
    2s/||2s|| is BITWISE equal to s/||s|| (power-of-two scaling is
    exact through IEEE divide and correctly-rounded sqrt)."""
    text = "the quick brown fox jumps over the lazy dog"
    docs = _docs(spark, [(1, text), (2, text + " " + text)])
    out = {r.doc_id: r.embedding for r in hashed_doc_vectors(docs).collect()}
    assert out[1] == out[2]


def test_bitwise_determinism_across_runs_and_partitionings(spark, sf_correctness):
    a = QUERIES["q_vectorize_hash"](spark, sf_correctness).collect()
    b = QUERIES["q_vectorize_hash"](spark, sf_correctness).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert a  # non-empty fixture


def test_vectors_not_axis_aligned_and_discriminative(spark):
    """Different token sets land in different directions; the signed
    multi-bucket spread means a multi-token doc is never a one-hot."""
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "zeta eta theta iota kappa"),
            (3, "alpha beta gamma delta epsilon"),
        ],
    )
    out = {r.doc_id: r.embedding for r in hashed_doc_vectors(docs).collect()}
    assert out[1] == out[3]  # same tokens -> identical vector
    cos = sum(x * y for x, y in zip(out[1], out[2]))
    assert abs(cos) < 0.9  # disjoint tokens -> far from parallel
    assert sum(1 for x in out[1] if x != 0.0) >= 4  # spread, not one-hot


def test_retrieval_prep_report_is_consistent_and_recalls(spark, sf_correctness):
    """The E2E serving pipeline: stage counts reconcile (every chunk
    became a vector), the probe row carries a real recall@k measured
    against the exact top-k (far above the random-candidate floor),
    and the whole report is deterministic run-to-run."""
    rep = {
        r.stage: r
        for r in QUERIES["q_retrieval_prep"](spark, sf_correctness).collect()
    }
    assert set(rep) == {"documents", "chunks", "vectors", "index_cells", "probe"}
    assert rep["chunks"].rows == rep["vectors"].rows > rep["documents"].rows
    assert rep["vectors"].metric == 64.0
    recall = rep["probe"].metric
    n_vecs = rep["vectors"].rows
    random_floor = 10.0 / n_vecs  # expected recall of random candidates
    assert 0.5 <= recall <= 1.0, recall
    assert recall > 50 * random_floor
    again = {
        tuple(r)
        for r in QUERIES["q_retrieval_prep"](spark, sf_correctness).collect()
    }
    assert again == {tuple(r) for r in rep.values()}
