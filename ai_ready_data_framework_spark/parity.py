"""Local replica of the driver's correctness gate.

For each declared query: run the Spark DataFrame and the DuckDB oracle
SQL over the same parquet tables, then compare row-count, column names,
and order-insensitive values (rows sorted by all columns, floats
compared to 1e-9 relative tolerance — the declared queries round their
float outputs to 4 decimals precisely so exact hashing is stable).

Used by tests/test_oracle_parity.py and runnable as a module:
    python -m ai_ready_data_framework_spark.parity [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys
from dataclasses import dataclass

import duckdb
import pandas as pd

from ai_ready_data_framework_spark.io import TABLE_NAMES, table_path


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str

    def __str__(self) -> str:  # pragma: no cover
        return f"{'PASS' if self.ok else 'FAIL'} {self.name}: {self.detail}"


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register every canonical table as a DuckDB view, mirroring the
    driver's pre-registered views."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a stable sort across engines, but keep originals for
    # tolerant float comparison
    if len(df) == 0:
        return df
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def _values_equal(a: object, b: object) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    if (a is None or a is pd.NA) and (b is None or b is pd.NA):
        return True
    return str(a) == str(b)


def _dtype_kind(dtype: object) -> str:
    """Collapse a pandas dtype to a comparison kind: integers 'i',
    floats 'f', everything else its numpy kind. Unsigned folds into
    'i'; pandas nullable extension dtypes map via their numpy kind."""
    kind = getattr(dtype, "kind", "O")
    return "i" if kind in ("i", "u") else kind


def check_dtype_drift(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame
) -> list[str]:
    """The driver's value-hash is REPRESENTATION-sensitive: DuckDB
    SUM(integer) → HUGEINT surfaces as decimal/float on its comparison
    path while Spark emits int64, failing the hash on identical values
    (VERDICT r1: q_sessionize, q_contamination). str()/isclose parity
    cannot see that, so compare numpy dtype KINDS per column: int vs
    float/object drift fails here exactly like it fails the driver.
    Nullable widening (int64 → float64 when NULLs are present) hits
    both engines' to-pandas paths identically, so kinds still agree on
    legitimately NULL-able columns."""
    problems = []
    for col in sorted(set(spark_pdf.columns) & set(oracle_pdf.columns)):
        sk, ok = _dtype_kind(spark_pdf[col].dtype), _dtype_kind(oracle_pdf[col].dtype)
        if sk != ok:
            problems.append(
                f"dtype drift col={col}: spark kind {sk!r} "
                f"({spark_pdf[col].dtype}) vs oracle kind {ok!r} "
                f"({oracle_pdf[col].dtype}) — uncast HUGEINT/decimal in the oracle?"
            )
    return problems


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> ParityResult:
    if len(spark_pdf) != len(oracle_pdf):
        return ParityResult(
            name, False, f"row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
        )
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return ParityResult(name, False, f"columns {s_cols} != oracle {o_cols}")
    drift = check_dtype_drift(spark_pdf, oracle_pdf)
    if drift:
        return ParityResult(name, False, "; ".join(drift))
    s = _normalize(spark_pdf)
    o = _normalize(oracle_pdf)
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (x, y) in enumerate(zip(sv, ov)):
            sx = x if not pd.isna(x) else None  # type: ignore[arg-type]
            sy = y if not pd.isna(y) else None  # type: ignore[arg-type]
            if sx is None and sy is None:
                continue
            if sx is None or sy is None or not _values_equal(sx, sy):
                return ParityResult(
                    name,
                    False,
                    f"value mismatch col={col} row={i}: spark={x!r} oracle={y!r}",
                )
    return ParityResult(name, True, f"{len(spark_pdf)} rows x {len(s_cols)} cols")


def run_parity(spark, sf_dir: str, names: list[str] | None = None) -> list[ParityResult]:
    from ai_ready_data_framework_spark.registry import ORACLES, QUERIES, load_all

    load_all()
    con = duckdb_connection(sf_dir)
    results: list[ParityResult] = []
    for name, fn in QUERIES.items():
        if names and name not in names:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            results.append(ParityResult(name, False, f"spark error: {exc}"))
            continue
        if name not in ORACLES:
            ok = len(spark_pdf) >= 0
            results.append(
                ParityResult(name, ok, f"(rows-only, no oracle) {len(spark_pdf)} rows")
            )
            continue
        try:
            oracle_pdf = con.execute(ORACLES[name]).df()
        except Exception as exc:  # noqa: BLE001
            results.append(ParityResult(name, False, f"oracle error: {exc}"))
            continue
        results.append(compare_frames(name, spark_pdf, oracle_pdf))
    return results


def main() -> int:  # pragma: no cover
    from ai_ready_data_framework_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or None
    spark = get_spark(shuffle_partitions=8)
    results = run_parity(spark, sf_dir, names)
    failed = [r for r in results if not r.ok]
    for r in results:
        print(r)
    print(f"\n{len(results) - len(failed)}/{len(results)} passed")
    return 1 if failed else 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
