"""Custom Python data source (Spark 4 DataSource V2 Python API): a
deterministic synthetic document-corpus generator with partition
planning and doc_id-range filter pushdown.

Why a generator source: scale tests need corpora far larger than the
driver's fixtures without paying storage — a 10^9-doc corpus exists
only as (seed, id-range) metadata, and every executor materializes
its own shard on demand. The same pattern (DataSource + planned
InputPartitions + pushFilters) is how any external system — a document
store, a feature service, a GraphQL API — plugs into the engine as a
first-class scan with pruning, instead of a collect-and-parallelize
hack through the driver.

Determinism contract: a row's content is a pure function of
(seed, doc_id) — NEVER of partitioning or pushed filters — so filter
pushdown and partition pruning cannot change what any surviving row
looks like (tested in tests/test_docgen.py).

Grounding: "Native formats" ingestion surface
(/root/reference/factors/2-consumable.md:17); the S-family row in
SURVEY.md §2.2.
"""

from __future__ import annotations

import random
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

DOCGEN_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)
_VOCAB = [
    "spark", "shuffle", "join", "hash", "scan", "filter", "window",
    "broadcast", "partition", "codegen", "arrow", "parquet", "stream",
    "state", "vector", "token", "merge", "sort", "index", "batch",
]
_LANGS = ["en", "es", "de", "zh", "fr"]


class _Range(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


def _gen_row(seed: int, doc_id: int) -> tuple:
    rng = random.Random((seed << 32) ^ doc_id)
    n_words = rng.randint(8, 64)
    text = " ".join(rng.choice(_VOCAB) for _ in range(n_words))
    lang = _LANGS[doc_id % len(_LANGS)]
    source = f"src{doc_id % 7}"
    return (doc_id, text, lang, source, len(text))


class DocGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.seed = int(options.get("seed", 42))
        # half-open pushed-down doc_id range, narrowed by pushFilters
        self.lo = 0
        self.hi = self.n_docs

    def pushFilters(self, filters):
        """Consume doc_id comparisons (they narrow the generated range
        — the Python-source analogue of parquet row-group pruning);
        yield everything else back for Spark to evaluate post-scan."""
        for f in filters:
            if getattr(f, "attribute", None) == ("doc_id",) and isinstance(
                getattr(f, "value", None), int
            ):
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                elif isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                else:
                    yield f
                continue
            yield f

    def partitions(self):
        """Fixed id-aligned chunks (content must not depend on the
        filter), pruned against the pushed range — partitions wholly
        outside [lo, hi) are never planned, so executors never start."""
        chunk = max(1, -(-self.n_docs // self.n_partitions))
        out = []
        for start in range(0, self.n_docs, chunk):
            end = min(start + chunk, self.n_docs)
            if end <= self.lo or start >= self.hi:
                continue  # pruned
            out.append(_Range(max(start, self.lo), min(end, self.hi)))
        # Spark requires at least one partition even for an empty scan
        return out or [_Range(0, 0)]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for doc_id in range(partition.lo, partition.hi):
            yield _gen_row(self.seed, doc_id)


class DocGenDataSource(DataSource):
    """`spark.read.format("docgen").option("n_docs", N)` after
    `register_docgen(spark)`."""

    @classmethod
    def name(cls) -> str:
        return "docgen"

    def schema(self) -> str:
        return DOCGEN_SCHEMA

    def reader(self, schema) -> DocGenReader:
        return DocGenReader(self.options)

    def streamReader(self, schema) -> "DocGenStreamReader":
        return DocGenStreamReader(self.options)


def register_docgen(spark) -> None:
    # Python-source filter pushdown ships behind a flag in Spark 4.1;
    # a reader that implements pushFilters() errors outright when the
    # flag is off, so registration owns turning it on.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DocGenDataSource)


class DocGenStreamReader(DataSourceStreamReader):
    """Micro-batch stream over the same deterministic corpus: offsets
    are doc_id high-water marks, each trigger emits the next
    ``batch_size`` ids until ``n_docs`` is exhausted. Offset-range
    semantics give replay/exactly-once for free: a re-planned batch
    (failure recovery) regenerates the identical rows because content
    is a pure function of (seed, doc_id)."""

    def __init__(self, options: dict):
        self.n_docs = int(options.get("n_docs", 1000))
        self.batch_size = int(options.get("batch_size", 100))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        # Reports FULL availability: the whole corpus is "already
        # there", so a catch-up trigger plans one micro-batch covering
        # everything remaining. batch_size bounds the PARTITION size
        # within that batch (parallelism + task granularity), not the
        # per-trigger admission — Python stream readers have no
        # admission-control hook in Spark 4.1, and pretending otherwise
        # here would just hide the batch boundary from the checkpoint.
        return {"pos": self.n_docs}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["pos"], end["pos"]
        if hi <= lo:
            return [_Range(0, 0)]
        step = max(1, self.batch_size)
        return [
            _Range(s, min(s + step, hi)) for s in range(lo, hi, step)
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for doc_id in range(partition.lo, partition.hi):
            yield _gen_row(self.seed, doc_id)

    def commit(self, end: dict) -> None:
        pass
