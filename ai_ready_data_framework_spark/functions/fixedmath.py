"""Engine-portable fixed-point transcendentals (VERDICT r7 #2).

``pow(p, alpha)`` via libm is the one primitive that blocked
hash-grading the mixture planners: Java's ``Math.pow`` and DuckDB's
``std::pow`` may differ by an ulp, and the planners FLOOR the result
into whole-integer outputs (expected docs, token budgets), so a single
ulp at a share boundary flips an integer.

This module replaces the libm call with an explicit ladder built ONLY
from operations that are bit-identical in every IEEE-754 engine:

- integer ``floor(log2(n))`` as ``length(bin(n)) - 1`` (exact — both
  engines print minimal binary strings),
- exact powers of two as ``1::BIGINT << e`` (integer shift),
- ``ln`` on the reduced mantissa m ∈ [1, 2) by the atanh series
  (z = (m-1)/(m+1) < 1/3; truncation < (1/3)^29 ≈ 1.5e-14),
- ``exp`` on the reduced argument r ∈ [0, ln 2) by the Taylor series
  (truncation < ln2^15/15! ≈ 2e-15),
- double literals (LN2, series coefficients, alpha) spelled with
  ``repr()`` so both parsers bind the identical nearest double.

Every step is +, -, ×, ÷, floor, shift, compare on identical inputs —
correctly rounded and deterministic per IEEE-754 — so the two engines
produce the BITWISE-identical result at every input, and the floored
integer outputs cannot disagree at any boundary. (Accuracy vs true
pow is ~1e-13 relative — documented approximation, not a promise of
libm equality; the ladder IS the operator's definition.)

The stage list is generated once and consumed twice: Spark binds each
stage with ``F.expr`` (same text), the DuckDB oracle nests the same
text through CTE-free subselects — identical op sequences by
construction, no cross-engine mirror to maintain by hand.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LN2 = repr(math.log(2))  # '0.6931471805599453' — nearest double to ln 2

# atanh-series terms for ln(m), m in [1,2): ln m = 2z * sum z^(2i)/(2i+1)
_ATANH_COEFFS = [repr(1.0 / (2 * i + 1)) for i in range(14)]
# Taylor terms for exp(r), r in [0, ln2)
_EXP_TERMS = 14

POW_SCALE = 10**12  # fixed-point scale of the pow output (p <= 1)


def _horner_atanh(z2: str) -> str:
    """sum_{i} z2^i / (2i+1) as a Horner chain over the bound column
    ``z2`` — each level is one multiply and one add on doubles."""
    acc = _ATANH_COEFFS[-1]
    for c in reversed(_ATANH_COEFFS[:-1]):
        acc = f"({c} + {z2} * ({acc}))"
    return acc


def _horner_exp(r: str) -> str:
    """sum_{i=0}^{N} r^i / i! as the standard Horner chain
    1 + r*(1 + r/2*(1 + r/3*(...))) over the bound column ``r``."""
    acc = "1.0"
    for i in range(_EXP_TERMS, 0, -1):
        acc = f"(1.0 + {r} * ({acc}) / {float(i)!r})"
    return acc


def _ln_stages(prefix: str, n: str) -> list[tuple[str, str]]:
    """Stage columns computing ln(n) for a BIGINT column n >= 1."""
    e = f"{prefix}_e"
    m = f"{prefix}_m"
    z = f"{prefix}_z"
    z2 = f"{prefix}_z2"
    return [
        (e, f"CAST(length(bin({n})) - 1 AS BIGINT)"),
        (m, f"CAST({n} AS DOUBLE) / CAST(CAST(1 AS BIGINT) << CAST({e} AS INT) AS DOUBLE)"),
        (z, f"({m} - 1.0) / ({m} + 1.0)"),
        (z2, f"{z} * {z}"),
        (f"{prefix}_ln", f"CAST({e} AS DOUBLE) * {LN2} + 2.0 * {z} * ({_horner_atanh(z2)})"),
    ]


def pow_alpha_stages(
    n: str, t: str, alpha: float, out: str = "s_fix"
) -> list[tuple[str, str]]:
    """(name, sql_expr) stages computing
    ``out = floor(POW_SCALE * (n/t)^alpha)`` for BIGINT columns
    1 <= n <= t. Later stages reference earlier stage NAMES, so each
    intermediate binds exactly once in both engines. All stage names
    are prefixed '__pw' for easy dropping."""
    st = _ln_stages("__pw_n", n) + _ln_stages("__pw_t", t)
    st += [
        ("__pw_y", f"{alpha!r} * (__pw_n_ln - __pw_t_ln)"),
        ("__pw_k", f"CAST(FLOOR(__pw_y / {LN2}) AS BIGINT)"),
        ("__pw_r", f"__pw_y - CAST(__pw_k AS DOUBLE) * {LN2}"),
        ("__pw_er", _horner_exp("__pw_r")),
        (
            "__pw_p2k",
            "CASE WHEN __pw_k >= 0"
            " THEN CAST(CAST(1 AS BIGINT) << CAST(__pw_k AS INT) AS DOUBLE)"
            " ELSE 1.0 / CAST(CAST(1 AS BIGINT) << CAST(-__pw_k AS INT) AS DOUBLE)"
            " END",
        ),
        (out, f"CAST(FLOOR(__pw_er * __pw_p2k * {float(POW_SCALE)!r}) AS BIGINT)"),
    ]
    return st


def with_pow_alpha(
    df: DataFrame, n: str, t: str, alpha: float, out: str = "s_fix"
) -> DataFrame:
    """Spark side: append ``out = floor(POW_SCALE * (n/t)^alpha)`` via
    the shared stage list (each stage is F.expr of the SAME text the
    oracle runs), then drop the intermediates."""
    temps = []
    for name, expr in pow_alpha_stages(n, t, alpha, out):
        df = df.withColumn(name, F.expr(expr))
        if name != out:
            temps.append(name)
    return df.drop(*temps)


def pow_alpha_py(n: int, t: int, alpha: float) -> int:
    """Pure-Python reference of the ladder — Python floats are IEEE
    doubles with correctly-rounded ops, so this mirrors the SQL stages
    bit-for-bit (the hypothesis property test sweeps it against
    DuckDB). Kept in lockstep with :func:`pow_alpha_stages`."""
    import math as _m

    ln2 = float(LN2)

    def _ln(v: int) -> float:
        e = v.bit_length() - 1
        # CAST(v AS DOUBLE) / 2^e: rounding commutes with exact
        # power-of-two scaling, so plain float division matches
        m = v / (1 << e)
        z = (m - 1.0) / (m + 1.0)
        z2 = z * z
        acc = float(_ATANH_COEFFS[-1])
        for c in reversed(_ATANH_COEFFS[:-1]):
            acc = float(c) + z2 * acc
        return float(e) * ln2 + 2.0 * z * acc

    y = alpha * (_ln(n) - _ln(t))
    k = _m.floor(y / ln2)
    r = y - float(k) * ln2
    acc = 1.0
    for i in range(_EXP_TERMS, 0, -1):
        acc = 1.0 + r * acc / float(i)
    p2k = float(1 << k) if k >= 0 else 1.0 / float(1 << -k)
    return _m.floor(acc * p2k * float(POW_SCALE))


def pow_alpha_sql(inner: str, n: str, t: str, alpha: float, out: str = "s_fix") -> str:
    """DuckDB side: wrap subquery ``inner`` in one SELECT per stage
    (the same stage exprs Spark binds), returning a subquery exposing
    inner's columns plus ``out``. Nesting keeps each intermediate
    evaluated once, matching the Spark op sequence."""
    sql = f"({inner})"
    for name, expr in pow_alpha_stages(n, t, alpha, out):
        sql = f"(SELECT *, {expr} AS {name} FROM {sql} __pwq_{name.strip('_')})"
    drops = [nm for nm, _ in pow_alpha_stages(n, t, alpha, out) if nm != out]
    return f"(SELECT * EXCLUDE ({', '.join(drops)}) FROM {sql} __pwq_final)"
