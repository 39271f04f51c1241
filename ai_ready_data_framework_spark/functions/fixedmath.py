"""Engine-portable fixed-point transcendentals.

libm transcendentals are the one primitive class that blocks
hash-grading: Java's ``Math.pow``/``Math.log`` and DuckDB's
``std::pow``/``std::log`` may differ by an ulp, and the graded
operators FLOOR/ROUND results into integers (expected docs, token
budgets, nano-unit score sums), so a single ulp at a boundary flips a
graded value. This module replaces every such call with explicit
ladders built ONLY from operations that are bit-identical in every
IEEE-754 engine. The family (grown r7 → r9):

- ``pow_alpha_*`` — floor(SCALE · (n/t)^alpha) for BIGINT n ≤ t
  (VERDICT r7 #2: the mixture planners).
- ``ln_ints`` / ``with_ln_ints`` — ln of BIGINT expressions (r9:
  BM25/TF-IDF idf, PSI log-ratios, entropy, KL, PMI, bigram logp).
- ``ln_pos`` / ``with_ln_pos`` — ln of a positive double in
  (2^-61, 4) via 2^61 fixed-point quantization (r9: the JS mixture
  ratio, the DP Laplace inverse-CDF).
- ``exp_pos`` / ``with_exp_pos`` — exp of a non-negative double (r9:
  perplexity).

The building blocks, shared by all of them:

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


# ---------------------------------------------------------------------------
# r9 (ADVICE r8): the integer-argument ln ladder as a first-class API.
# BM25's idf and PSI's log-ratio are differences of ln over BIGINT
# expressions — idf = ln(2N+2) − ln(2df+1); ln(p_cur/p_ref) =
# (ln(n_cur+1) + ln(T_ref)) − (ln(n_ref+1) + ln(T_cur)) — so the same
# share-the-SQL-text trick that made pow hash-safe removes the last
# libm transcendental from under the hash gate: a 1-ulp Java-vs-DuckDB
# ln difference can no longer flip a floored nano-unit, because both
# engines run the IDENTICAL +,−,×,÷/shift ladder.
# ---------------------------------------------------------------------------


def ln_int_stages(prefix: str, n: str) -> list[tuple[str, str]]:
    """(name, sql_expr) stages computing ``{prefix}_ln = ln(n)`` for a
    BIGINT sql expression ``n`` >= 1 (the expression may reference
    columns of the frame; it is re-evaluated in two stages — integer
    arithmetic, deterministic). All stage names carry ``prefix``."""
    return _ln_stages(prefix, n)


def with_ln_ints(df: DataFrame, specs: list[tuple[str, str]]) -> DataFrame:
    """Spark side: for each (prefix, n_expr) bind the ladder stages via
    F.expr of the SAME text the oracle runs, leaving one ``{prefix}_ln``
    double column per spec and dropping the intermediates."""
    keep = {f"{p}_ln" for p, _ in specs}
    temps = []
    for prefix, n in specs:
        for name, expr in _ln_stages(prefix, n):
            df = df.withColumn(name, F.expr(expr))
            if name not in keep:
                temps.append(name)
    return df.drop(*temps)


def ln_ints_sql(inner: str, specs: list[tuple[str, str]]) -> str:
    """DuckDB side: wrap subquery ``inner`` in one SELECT per stage
    (the same stage exprs Spark binds), returning a subquery exposing
    inner's columns plus one ``{prefix}_ln`` per spec, intermediates
    dropped. Nesting keeps each intermediate evaluated once, matching
    the Spark op sequence."""
    keep = {f"{p}_ln" for p, _ in specs}
    sql = f"({inner})"
    drops = []
    for prefix, n in specs:
        for name, expr in _ln_stages(prefix, n):
            sql = f"(SELECT *, {expr} AS {name} FROM {sql} __lnq_{name.strip('_')})"
            if name not in keep:
                drops.append(name)
    return f"(SELECT * EXCLUDE ({', '.join(drops)}) FROM {sql} __lnq_final)"


# Fixed-point ln for a POSITIVE DOUBLE expression (r9): quantize
# x ∈ (2^-61, 4) to q = floor(x · 2^61) (fits BIGINT), run the integer
# ladder on q, subtract 61·ln2. The quantization redefines the value
# by ≤ 2^-61/x relative (≤ ~5e-10 for x ≥ 1e-9) — like the pow
# ladder, the quantized form IS the operator's definition, and both
# engines compute it bitwise-identically. Used where a log argument is
# an irreducible double (the JS divergence mixture ratio p/m — its
# denominator p_s+p_c has no common-denominator integer form that
# stays inside int64 at fleet-scale token counts).
LN_POS_SHIFT = 61
# The shift·ln2 offset is emitted as CAST(shift AS DOUBLE) * LN2 — the
# same guaranteed-safe shape _ln_stages uses for e·ln2. Two traps this
# dodges: a `61.0 * LN2` decimal×decimal multiply is not IEEE (and
# overflows DuckDB's DECIMAL(18)); and a single 17-significant-digit
# literal is NOT safe either — DuckDB converts DECIMAL→DOUBLE as
# scaled-int/10^k double division, which is off by 1 ulp once the
# scaled int exceeds 2^53 (measured on 30.550984759064562). LN2's 16
# digits keep its scaled int under 2^53, so decimal→double stays exact
# and the double multiply is correctly rounded on every engine.


def ln_pos_stages(
    prefix: str, x: str, shift: int = LN_POS_SHIFT
) -> list[tuple[str, str]]:
    """(name, sql_expr) stages computing ``{prefix}_ln ≈ ln(x)`` for a
    positive DOUBLE sql expression ``x`` (must be bitwise-identical on
    both engines — e.g. a ratio of exact-integer-derived doubles).
    ``shift`` sets the fixed-point domain: x must lie in
    (2^-shift, 2^(63-shift)) — the default 61 covers (0, 4) ratios;
    57 covers (0, 64) for log-of-log shapes like the Gumbel draw."""
    q = f"CAST(FLOOR(({x}) * {float(1 << shift)!r}) AS BIGINT)"
    st = _ln_stages(f"{prefix}_q", q)
    st.append(
        (
            f"{prefix}_ln",
            f"{prefix}_q_ln - (CAST({shift} AS DOUBLE) * {LN2})",
        )
    )
    return st


def _pos_spec(spec) -> tuple[str, str, int]:
    """(prefix, x) or (prefix, x, shift) -> normalized 3-tuple."""
    return spec if len(spec) == 3 else (spec[0], spec[1], LN_POS_SHIFT)


def with_ln_pos(df: DataFrame, specs: list) -> DataFrame:
    """Spark side of :func:`ln_pos_stages` (mirrors with_ln_ints).
    Specs are (prefix, x_expr) or (prefix, x_expr, shift)."""
    keep = {f"{_pos_spec(s)[0]}_ln" for s in specs}
    temps = []
    for spec in specs:
        prefix, x, shift = _pos_spec(spec)
        for name, expr in ln_pos_stages(prefix, x, shift):
            df = df.withColumn(name, F.expr(expr))
            if name not in keep:
                temps.append(name)
    return df.drop(*temps)


def ln_pos_sql(inner: str, specs: list) -> str:
    """DuckDB side of :func:`ln_pos_stages` (mirrors ln_ints_sql)."""
    keep = {f"{_pos_spec(s)[0]}_ln" for s in specs}
    sql = f"({inner})"
    drops = []
    for spec in specs:
        prefix, x, shift = _pos_spec(spec)
        for name, expr in ln_pos_stages(prefix, x, shift):
            sql = f"(SELECT *, {expr} AS {name} FROM {sql} __lpq_{name.strip('_')})"
            if name not in keep:
                drops.append(name)
    return f"(SELECT * EXCLUDE ({', '.join(drops)}) FROM {sql} __lpq_final)"


def ln_pos_py(x: float, shift: int = LN_POS_SHIFT) -> float:
    """Pure-Python reference of the positive-double ln ladder."""
    import math as _m

    return ln_int_py(_m.floor(x * float(1 << shift))) - float(shift) * float(
        LN2
    )


# exp for a NON-NEGATIVE DOUBLE expression (r9): the pow ladder's own
# exp tail extracted — k = floor(x/ln2), Taylor-Horner on the reduced
# r ∈ [0, ln2), scale by the exact power of two. Used for
# perplexity = exp(-avg_logp) (avg_logp ≤ 0 by construction).


def exp_pos_stages(prefix: str, x: str) -> list[tuple[str, str]]:
    """(name, sql_expr) stages computing ``{prefix}_exp = exp(x)`` for
    a NON-NEGATIVE double sql expression ``x`` (bitwise-identical on
    both engines).

    Domain: ``0 <= x < 125*LN2`` (~86.6; exp(x) < 2^125). The
    power-of-two scale is two int64 shifts of at most 62 each —
    multiplying two exact powers of two only adds exponents, so the
    split costs zero ulps (ADVICE r9: a single ``1 << k`` wrapped for
    k >= 63, i.e. x >= ~43.67, silently going negative). Beyond the
    domain the first shift still wraps; callers needing exp of
    anything near 2^125 are outside every ladder use case (perplexity
    exponents are bounded by ln(vocab+corpus) < 30)."""
    k = f"{prefix}_k"
    r = f"{prefix}_r"
    er = f"{prefix}_er"
    half = f"LEAST(CAST({k} AS INT), 62)"
    rest = f"(CAST({k} AS INT) - {half})"
    return [
        (k, f"CAST(FLOOR(({x}) / {LN2}) AS BIGINT)"),
        (r, f"({x}) - CAST({k} AS DOUBLE) * {LN2}"),
        (er, _horner_exp(r)),
        (
            f"{prefix}_exp",
            f"{er} * CAST(CAST(1 AS BIGINT) << {half} AS DOUBLE)"
            f" * CAST(CAST(1 AS BIGINT) << {rest} AS DOUBLE)",
        ),
    ]


def with_exp_pos(df: DataFrame, specs: list[tuple[str, str]]) -> DataFrame:
    """Spark side of :func:`exp_pos_stages` (domain 0 <= x < 125*LN2,
    see there)."""
    keep = {f"{p}_exp" for p, _ in specs}
    temps = []
    for prefix, x in specs:
        for name, expr in exp_pos_stages(prefix, x):
            df = df.withColumn(name, F.expr(expr))
            if name not in keep:
                temps.append(name)
    return df.drop(*temps)


def exp_pos_sql(inner: str, specs: list[tuple[str, str]]) -> str:
    """DuckDB side of :func:`exp_pos_stages`."""
    keep = {f"{p}_exp" for p, _ in specs}
    sql = f"({inner})"
    drops = []
    for prefix, x in specs:
        for name, expr in exp_pos_stages(prefix, x):
            sql = f"(SELECT *, {expr} AS {name} FROM {sql} __epq_{name.strip('_')})"
            if name not in keep:
                drops.append(name)
    return f"(SELECT * EXCLUDE ({', '.join(drops)}) FROM {sql} __epq_final)"


def exp_pos_py(x: float) -> float:
    """Pure-Python reference of the non-negative exp ladder."""
    import math as _m

    ln2 = float(LN2)
    k = _m.floor(x / ln2)
    r = x - float(k) * ln2
    acc = 1.0
    for i in range(_EXP_TERMS, 0, -1):
        acc = 1.0 + r * acc / float(i)
    return acc * float(1 << k)


def ln_int_py(n: int) -> float:
    """Pure-Python reference of the ln ladder (IEEE doubles with
    correctly-rounded ops — mirrors the SQL stages bit-for-bit; the
    hypothesis property test sweeps it against DuckDB)."""
    e = n.bit_length() - 1
    m = n / (1 << e)
    z = (m - 1.0) / (m + 1.0)
    z2 = z * z
    acc = float(_ATANH_COEFFS[-1])
    for c in reversed(_ATANH_COEFFS[:-1]):
        acc = float(c) + z2 * acc
    return float(e) * float(LN2) + 2.0 * z * acc


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
