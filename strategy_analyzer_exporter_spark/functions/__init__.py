"""Scalar / array column-expression helpers shared by the operators.

Every helper exists in two mirrored forms: a Spark ``Column`` builder and
a DuckDB SQL fragment builder (suffix ``_sql``) used by the oracle. The
pair is written so both engines execute the *same IEEE-754 operations in
the same order* — sums are explicit left-folds (Spark ``F.aggregate``,
DuckDB ``list_reduce``), never engine-native aggregates whose combine
order is unspecified — so results hash-match bit-for-bit.

Formulas implement the reference's feature math:
- location value:   Price.cs:24-38   (OLV/CLV with zero-range guard)
- distance:         MovingAverage.cs:35-48 (NaN/Inf + near-zero guards)
- slope:            Common.cs:14-27  (pct change first→last of window)
- autocorrelation:  Common.cs:29-60  (full-window mean/variance, lag-1;
                    NOT Pearson corr of (x, lag(x)) pairs — the mean and
                    denominator are computed over the whole window)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOLERANCE = 1e-6  # reference near-zero guard (Common.cs:23-24, Price.cs:28)
INF = float("inf")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------------------
# Text tokenization (shared by dedup + text-analysis operators)


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties dropped. The corpus is single-space
    separated lowercase words, and both engines split identically.

    ``array_remove`` rather than the equivalent ``F.filter(..., lambda)``:
    lambda higher-order functions are interpreted (never codegen) while
    array_remove is a plain collection expression — same result, and it
    keeps token-consuming plans off the interpreted path."""
    return F.array_remove(F.split(text, " "), "")


TOKENS_SQL = "list_filter(string_split(text, ' '), t -> t <> '')"


# ---------------------------------------------------------------------------
# Row-local price features (W6/W7)


def location_value(anchor: Column | str, high: Column | str, low: Column | str) -> Column:
    """(2*anchor - high - low) / (high - low), 0.0 when range < tolerance
    (Price.cs:24-38). ``anchor`` is open for OLV, close for CLV."""
    a, h, lo = _c(anchor), _c(high), _c(low)
    rng = h - lo
    return F.when(F.abs(rng) < TOLERANCE, F.lit(0.0)).otherwise(
        (F.lit(2.0) * a - h - lo) / rng
    )


def location_value_sql(anchor: str, high: str, low: str) -> str:
    return (
        f"CASE WHEN abs(({high}) - ({low})) < 1e-6 THEN 0.0 "
        f"ELSE (2.0*({anchor}) - ({high}) - ({low})) / (({high}) - ({low})) END"
    )


# ---------------------------------------------------------------------------
# Validity guards (P6/P7)


def _invalid(c: Column) -> Column:
    return c.isNull() | F.isnan(c) | (F.abs(c) == F.lit(INF))


def _invalid_sql(e: str) -> str:
    return f"(({e}) IS NULL OR isnan({e}) OR isinf({e}))"


# ---------------------------------------------------------------------------
# MA distance (W3)


def ma_distance(close: Column | str, ma: Column | str) -> Column:
    """((close - ma)/ma)*100; 0.0 on NaN/Inf inputs or |ma| < tolerance
    (MovingAverage.cs:35-48, guards :41-45,58-61)."""
    c, m = _c(close), _c(ma)
    return (
        F.when(_invalid(c) | _invalid(m), F.lit(0.0))
        .when(F.abs(m) < TOLERANCE, F.lit(0.0))
        .otherwise((c - m) / m * F.lit(100.0))
    )


def ma_distance_sql(close: str, ma: str) -> str:
    return (
        f"CASE WHEN {_invalid_sql(close)} OR {_invalid_sql(ma)} THEN 0.0 "
        f"WHEN abs({ma}) < 1e-6 THEN 0.0 "
        f"ELSE (({close}) - ({ma})) / ({ma}) * 100.0 END"
    )


# ---------------------------------------------------------------------------
# Left-fold sum over an array column — the order-pinned sum primitive


def fold_sum(arr: Column) -> Column:
    """Sequential left-fold sum: ((0 + x0) + x1) + ... — identical order
    to the DuckDB fragment below, so doubles match bit-for-bit."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def fold_sum_sql(arr: str) -> str:
    return f"list_reduce([CAST(0.0 AS DOUBLE)] || ({arr}), (acc, x) -> acc + x)"


# ---------------------------------------------------------------------------
# Slope (W5): percentage change first→last over the window array


def slope(arr: Column, tolerance: float = TOLERANCE) -> Column:
    """((last - first)/first)*100; 0.0 when n < 2 or |first| < tolerance
    (Common.cs:14-27). Pass ``tolerance=lookback_period_slow`` to
    reproduce the reference's argument-swap quirk (MovingAverage.cs:30
    passes LookbackPeriodSlow as the tolerance; SURVEY.md §2.3)."""
    first = F.element_at(arr, 1)
    last = F.element_at(arr, -1)
    return (
        F.when(F.size(arr) < 2, F.lit(0.0))
        .when(F.abs(first) < F.lit(float(tolerance)), F.lit(0.0))
        .otherwise((last - first) / first * F.lit(100.0))
    )


def slope_sql(arr: str, tolerance: float = TOLERANCE) -> str:
    return (
        f"CASE WHEN len({arr}) < 2 THEN 0.0 "
        f"WHEN abs(({arr})[1]) < CAST({tolerance!r} AS DOUBLE) THEN 0.0 "
        f"ELSE (({arr})[-1] - ({arr})[1]) / ({arr})[1] * 100.0 END"
    )


# ---------------------------------------------------------------------------
# Autocorrelation (W4): reference formula, lag k, over the window array


def autocorr(arr: Column, lag: int = 1) -> Column:
    """Reference autocorrelation (Common.cs:29-60):
      m    = (Σ x_i)/n                      (whole window)
      num  = Σ_{i≥lag} (x_i − m)(x_{i−lag} − m)
      den  = Σ (x_i − m)²
      res  = num/den; 0.0 when n ≤ lag or |den| < 1e-6.
    All sums are left-folds; indexes below are 1-based (element_at)."""
    n = F.size(arr)
    m = fold_sum(arr) / n.cast("double")
    num_terms = F.transform(
        F.sequence(F.lit(lag + 1), n),
        lambda i: (F.element_at(arr, i) - m) * (F.element_at(arr, i - lag) - m),
    )
    den_terms = F.transform(arr, lambda x: (x - m) * (x - m))
    num = fold_sum(num_terms)
    den = fold_sum(den_terms)
    return (
        F.when(n <= F.lit(lag), F.lit(0.0))
        .when(F.abs(den) < TOLERANCE, F.lit(0.0))
        .otherwise(num / den)
    )


def autocorr_sql(arr: str, lag: int = 1) -> str:
    """DuckDB mirror of :func:`autocorr` — same folds, same order.
    Uses 1-based list indexing and range(a, b) which is end-exclusive."""
    n = f"len({arr})"
    m = f"({fold_sum_sql(arr)} / CAST({n} AS DOUBLE))"
    num_terms = (
        f"list_transform(range({lag + 1}, {n} + 1), "
        f"i -> (({arr})[i] - {m}) * (({arr})[i - {lag}] - {m}))"
    )
    den_terms = f"list_transform({arr}, x -> (x - {m}) * (x - {m}))"
    return (
        f"CASE WHEN {n} <= {lag} THEN 0.0 "
        f"WHEN abs({fold_sum_sql(den_terms)}) < 1e-6 THEN 0.0 "
        f"ELSE {fold_sum_sql(num_terms)} / {fold_sum_sql(den_terms)} END"
    )


# ---------------------------------------------------------------------------
# EMA as an explicit left-fold over a prefix array (oracle form of W1/W2)


def ema_fold(prefix_arr: Column, span: int) -> Column:
    """EMA via left-fold over the series prefix: acc + α(x − acc), seeded
    with the first element (NinjaTrader EMA semantics: seeded with first
    value, α = 2/(span+1); consumed by the reference at
    StrategyAnalyzerExporter.cs:138-139,214-215). O(n²) per partition —
    used for oracle parity and small windows; the scale path is the O(n)
    Arrow-batched loop in operators/features.py which executes the same
    float ops in the same order."""
    alpha = 2.0 / (span + 1.0)
    return F.aggregate(
        F.slice(prefix_arr, 2, F.greatest(F.size(prefix_arr) - 1, F.lit(0))),
        F.element_at(prefix_arr, 1).cast("double"),
        lambda acc, x: acc + F.lit(alpha) * (x - acc),
    )


def ema_fold_sql(prefix_arr: str, span: int) -> str:
    alpha = f"(CAST(2.0 AS DOUBLE) / CAST({span + 1}.0 AS DOUBLE))"
    return f"list_reduce({prefix_arr}, (acc, x) -> acc + {alpha} * (x - acc))"


# ---------------------------------------------------------------------------
# Exact decimal-backed aggregates for oracle-stable relational queries


def dsum(col: Column | str, scale: int = 10) -> Column:
    """Order-independent exact sum: cast each double to DECIMAL(38,scale),
    sum exactly, cast the total back to double — so parallel partial
    aggregation cannot perturb the result. The final decimal→double cast
    goes THROUGH A STRING: engines' direct decimal→double conversions can
    disagree by 1 ulp (DuckDB divides a float-converted int128 by 10^scale
    — two roundings — while the JVM rounds correctly once), but
    decimal→string is exact and string→double is correctly rounded in
    both. Used by every oracle-checked relational query."""
    return F.sum(_c(col).cast(f"decimal(38,{scale})")).cast("string").cast("double")


def dsum_sql(expr: str, scale: int = 10) -> str:
    return (
        f"CAST(CAST(sum(CAST(({expr}) AS DECIMAL(38,{scale}))) AS VARCHAR) AS DOUBLE)"
    )


def davg(col: Column | str, scale: int = 10) -> Column:
    """Exact-sum-based average: exact decimal sum → double, divided by
    count → double. One identical double division in both engines
    (decimal *division* scale rules differ between engines, so the
    division itself must happen in double)."""
    c = _c(col)
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("string").cast(
        "double"
    ) / F.count(c).cast("double")


def davg_sql(expr: str, scale: int = 10) -> str:
    return (
        f"(CAST(CAST(sum(CAST(({expr}) AS DECIMAL(38,{scale}))) AS VARCHAR) AS DOUBLE) "
        f"/ CAST(count({expr}) AS DOUBLE))"
    )


def hex8_to_long_sql(expr: str) -> str:
    """Portable SQL (identical text valid in Spark SQL and DuckDB):
    first 8 hex chars of ``expr`` as a BIGINT — base-16 fold via
    instr/substring, every term an exact integer. Used for hash
    features and order-independent table checksums."""
    terms = " + ".join(
        f"(CAST(instr('0123456789abcdef', substring({expr}, {i + 1}, 1)) AS BIGINT) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"({terms})"
