"""Fit-time input caching for iterative MLlib estimators.

MLlib's iterative fits (KMeans, LogisticRegression) run one-or-more
Spark jobs PER ITERATION over the same input; if that input is an
uncached lineage, every iteration re-executes it end-to-end (parquet
scan + projection + array→vector conversion). MLlib warns about this
("The input data is not directly cached") but does not cache for you.

The helper below persists the input only for the duration of the fit,
then releases the blocks immediately — no cache outlives the operator
call (ADVICE r3: caches leaking past an operator distorted best-of-N
bench timings and accumulated in the session until LRU eviction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fit_cached(estimator, train: DataFrame):
    """Fit `estimator` on a persisted copy of `train`; always unpersist.

    The returned model is a driver-side object, so releasing the blocks
    after fit() cannot invalidate it; downstream transforms re-derive
    the (cheap, single-pass) lineage on their own schedule.
    """
    train = train.persist()
    try:
        return estimator.fit(train)
    finally:
        train.unpersist()
