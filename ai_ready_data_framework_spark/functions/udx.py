"""User-defined function surface (SURVEY.md §2.2 "UDF/UDAF/UDTF"):
one working, tested example of each extension point, all
Arrow-vectorized — never row-at-a-time Python.

Policy (SURVEY.md §2.2): no UDF appears in any declared oracle query —
native Catalyst expressions keep DuckDB parity and whole-stage codegen.
These exist as the EXTENSION surface users plug custom logic into, and
each ships with a native-expression twin in tests proving the UDF path
computes exactly what the built-in path does (so adopting the extension
point never silently changes semantics).

- ``slugify``          scalar pandas_udf (Series -> Series)
- ``geometric_mean``   grouped-aggregate pandas_udf (Series -> scalar)
- ``WordIndexUDTF``    Python UDTF (Spark >= 3.5, one row -> N rows)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType, LongType, StringType


@pandas_udf(StringType())
def slugify(text: pd.Series) -> pd.Series:
    """Scalar pandas UDF: lowercase, collapse non-alphanumerics to
    single dashes, trim dashes — the id-safe slug of a title. Arrow
    batches in, vectorized pandas string ops, Arrow batches out."""
    return (
        text.str.lower()
        .str.replace(r"[^a-z0-9]+", "-", regex=True)
        .str.strip("-")
    )


COMPRESS_LEVEL = 6  # zlib default-strength level, pinned for
# same-build determinism: same bytes + same level + same zlib build
# -> same compressed length


@pandas_udf(LongType())
def compressed_len(text: pd.Series) -> pd.Series:
    """Scalar pandas UDF: zlib-compressed byte length at the pinned
    ``COMPRESS_LEVEL``. Deflate has no Catalyst expression, so this is
    the sanctioned Python hot path: Arrow batches in, stdlib zlib per
    value, Arrow batches out. Deterministic per zlib BUILD — same
    bytes + same level + same zlib implementation -> same length.
    zlib's format promise covers round-trip fidelity only, NOT stable
    compressed output across implementations (zlib-ng or differently
    linked CPython builds may emit different lengths), so a cluster
    mixing zlib builds across driver/executors could disagree with a
    single-build oracle (ADVICE r10). q_quality_compress is therefore
    rows-only graded and must stay out of any hash-exact window
    unless the zlib build is pinned cluster-wide."""
    import zlib

    return text.map(
        lambda t: len(zlib.compress((t or "").encode("utf-8"), COMPRESS_LEVEL))
    )


def slugify_native(col):
    """The Catalyst twin of ``slugify`` (tests pin equivalence)."""
    return F.regexp_replace(
        F.regexp_replace(F.lower(col), r"[^a-z0-9]+", "-"), r"^-|-$", ""
    )


@pandas_udf(DoubleType())
def geometric_mean(v: pd.Series) -> float:
    """Grouped-aggregate pandas UDF: exp(mean(ln x)) over positive
    values — the multiplicative average (rate/ratio aggregation) Spark
    has no built-in for. NumPy-vectorized per Arrow batch."""
    return float(np.exp(np.log(v[v > 0]).mean()))


def geometric_mean_native(col):
    """Catalyst twin: EXP(AVG(LN(x))) over positive values."""
    return F.exp(F.avg(F.when(F.col(col) > 0, F.log(F.col(col)))))


@udtf(returnType="pos int, word string, n_chars int")
class WordIndexUDTF:
    """Python UDTF: explode a text into (position, word, length) rows
    — the table-function shape for custom exploders (sentence
    splitters, parser emitters). The native twin is
    posexplode(split(text)); tests pin exact equivalence."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, w in enumerate(text.split(" ")):
            yield i, w, len(w)
