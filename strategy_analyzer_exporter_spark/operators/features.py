"""The reference's feature pipeline, Spark-first.

Reference dataflow (SURVEY.md §3.1): bar stream → warm-up gate → session
time filter → per-day sliding-window features → alphabetical projection
+ float32 narrowing → sink. Features (FeatureEngineering/*):

  W1/W2  EMA(9)/EMA(21) of close          (NinjaTrader EMA indicator)
  W3     MA distance (fast & slow)        MovingAverage.cs:35-48
  W4     MA autocorrelation lag-1 (both)  Common.cs:29-60
  W5     MA slope (fast)                  Common.cs:14-27
  W6/W7  open/close location value        Price.cs:7-38
  W8     per-day state reset              FeaturesBarService.cs:32-38
  P3     session time predicate           StrategyAnalyzerExporter.cs:189-194
  P5     warm-up gate (≥20 rows in day)   FeaturesBarService.cs:44

Spark architecture: everything is one declarative plan sharing a single
``partitionBy(day).orderBy(time)`` exchange — Catalyst computes all
window arrays in one pass over sorted day-partitions. The only Python
is the EMA (inherently recursive): an Arrow-batched ``applyInPandas``
per day doing an O(n) left-fold loop. The fold order (acc + α(x−acc),
seeded with first close) is identical to the DuckDB oracle's
``list_reduce`` over prefix lists, so doubles match bit-for-bit.

At 100 TB: days partition the data naturally (≈ thousands of rows per
(instrument, day) group); ``applyInPandas`` groups stay small and
parallelism is bounded by #days × #instruments, not data volume. The
window frame is a constant 21 rows, so state per task is O(1).

DELIBERATE EMA DIVERGENCE (flagship vs reference binary): the
reference's NinjaTrader EMA indicators are constructed once for the
whole loaded series and update on EVERY bar — across day boundaries and
through out-of-session bars; only the window *buffers* reset per day
(StrategyAnalyzerExporter.cs:138-139, FeaturesBarService.cs:32-44).
``features_df`` instead scopes the EMA to (day, session) — a parallel,
shuffle-friendly semantic where each day is self-contained, so the
first ~20 bars of a day see differently-seeded MAs than the C# binary.
Reference-faithful alternatives, both oracle-checked:
- :func:`features_df_full_ema` (query ``features_flagship_full_ema``)
  — full-series continuously-seeded EMA feeding the per-day buffers,
  the reference-exact composition;
- ``feature_ema_full_series`` (operators/extra_queries.py) — the
  full-series EMA alone, per instrument.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from strategy_analyzer_exporter_spark import functions as X
from strategy_analyzer_exporter_spark.schema import export_select
from strategy_analyzer_exporter_spark.sources.bars import BARS_CTE, bars_df


@dataclass(frozen=True)
class FeatureConfig:
    """Knobs of the reference pipeline (StrategyAnalyzerExporter.cs:69-148).

    ``strict_reference_tolerance`` reproduces the reference's
    argument-swap quirk: MovingAverages.Compute passes
    ``config.LookbackPeriodSlow`` as CalculateSlope's *tolerance*
    parameter (Features/MovingAverages/MovingAverages.cs:30), and the
    reference config sets ``LookbackPeriodSlow = 14``
    (StrategyAnalyzerExporter.cs:125) — NOT the EMA slow span of 21 —
    so the slope zeroes out whenever |first| < 14. Default False = the
    intended semantics (tolerance 1e-6). SURVEY.md §2.3."""

    span_fast: int = 9  # EMA fast period (StrategyAnalyzerExporter.cs:138)
    span_slow: int = 21  # EMA slow period (:139)
    window: int = 21  # circular-buffer capacity (FeaturesBarService.cs:22)
    bars_required: int = 20  # warm-up threshold (StrategyAnalyzerExporter.cs:86)
    time_start: int = 90000  # session start HHmmss (:96)
    time_end: int = 155500  # session end HHmmss (:97)
    autocorr_lag: int = 1  # MovingAverage.cs:23-28
    lookback_period_slow: int = 14  # StrategyAnalyzerExporter.cs:125
    use_float32: bool = True  # UseFloat32 (:94)
    strict_reference_tolerance: bool = False
    # Streaming output lag: the reference exports bar index [1] — one
    # behind the in-flight close (StrategyAnalyzerExporter.cs:207-215) —
    # so each feature row is held back until `lag` later bars arrive.
    # Batch is a no-op (all bars are closed, SURVEY §2.5); the streaming
    # state operator honors it, withholding each day's trailing rows.
    export_lag_bars: int = 0

    @property
    def slope_tolerance(self) -> float:
        return (
            float(self.lookback_period_slow)
            if self.strict_reference_tolerance
            else X.TOLERANCE
        )


#: Config the flagship/test queries use: the corpus' synthetic days have
#: ~33-3300 rows spread over 24h, so the reference's 0900-1555 session
#: would starve the 20-bar warm-up at small scale factors. Same operators,
#: wider session.
TESTDATA_CONFIG = FeatureConfig(time_start=20000, time_end=235500)


# ---------------------------------------------------------------------------
# W1/W2 — EMA columns (the one Python-side operator)


def with_ema(df: DataFrame, cfg: FeatureConfig = FeatureConfig()) -> DataFrame:
    """Add ``moving_average`` (EMA span_fast) and ``slow_moving_average``
    (EMA span_slow) of ``close`` per day, ordered by ``time``.

    Arrow-batched grouped-map; O(n) per group. The loop body
    ``acc = acc + α*(x - acc)`` (seed = first close) executes the exact
    float64 op sequence of the oracle's ``list_reduce`` fold."""
    a_fast = 2.0 / (cfg.span_fast + 1.0)
    a_slow = 2.0 / (cfg.span_slow + 1.0)
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("moving_average", T.DoubleType(), False),
            T.StructField("slow_moving_average", T.DoubleType(), False),
        ]
    )

    def ema_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("time", kind="mergesort").reset_index(drop=True)
        closes = [float(v) for v in pdf["close"]]
        for alpha, name in ((a_fast, "moving_average"), (a_slow, "slow_moving_average")):
            out = [0.0] * len(closes)
            if closes:
                acc = closes[0]
                out[0] = acc
                for i in range(1, len(closes)):
                    acc = acc + alpha * (closes[i] - acc)
                    out[i] = acc
            pdf[name] = pd.Series(out, dtype="float64")
        return pdf

    return df.groupBy("day").applyInPandas(ema_group, out_schema)


def _with_ema_and_lag_products(df: DataFrame, cfg: FeatureConfig) -> DataFrame:
    """EMA columns + their within-day lag products (_y_f = maᵢ·maᵢ₋₁) in
    ONE grouped-map pass — the products fall out of the same loop, saving
    a whole WindowExec pass vs computing them with lag() afterwards."""
    a_fast = 2.0 / (cfg.span_fast + 1.0)
    a_slow = 2.0 / (cfg.span_slow + 1.0)
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("moving_average", T.DoubleType(), False),
            T.StructField("slow_moving_average", T.DoubleType(), False),
            T.StructField("_y_f", T.DoubleType(), True),
            T.StructField("_y_s", T.DoubleType(), True),
        ]
    )

    def ema_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("time", kind="mergesort").reset_index(drop=True)
        closes = [float(v) for v in pdf["close"]]
        n = len(closes)
        for alpha, ma_name, y_name in (
            (a_fast, "moving_average", "_y_f"),
            (a_slow, "slow_moving_average", "_y_s"),
        ):
            ma = [0.0] * n
            y: list[float | None] = [None] * n
            if n:
                acc = closes[0]
                ma[0] = acc
                for i in range(1, n):
                    nxt = acc + alpha * (closes[i] - acc)
                    ma[i] = nxt
                    y[i] = nxt * acc
                    acc = nxt
            pdf[ma_name] = pd.Series(ma, dtype="float64")
            pdf[y_name] = pd.Series(y, dtype="float64")
        return pdf

    return df.groupBy("day").applyInPandas(ema_group, out_schema)


def with_ema_fold(df: DataFrame, cfg: FeatureConfig = FeatureConfig()) -> DataFrame:
    """Pure-expression EMA via prefix-array left-fold — no Python at all,
    O(n²) memory per day. Used to cross-check :func:`with_ema` (both must
    agree bit-for-bit) and wherever a plan must stay UDF-free."""
    w = Window.partitionBy("day").orderBy("time").rowsBetween(
        Window.unboundedPreceding, 0
    )
    pfx = F.collect_list("close").over(w)
    return df.select(
        "*",
        X.ema_fold(pfx, cfg.span_fast).alias("moving_average"),
        X.ema_fold(pfx, cfg.span_slow).alias("slow_moving_average"),
    )


# ---------------------------------------------------------------------------
# Full pipeline


def _dec_to_double(c: Column) -> Column:
    """decimal → double THROUGH a string (see functions.dsum: engines'
    direct decimal→double casts can differ by 1 ulp)."""
    return c.cast("string").cast("double")


def _window_stat_cols(
    ma_col: str, y_col: str, sfx: str, w_day, cfg: FeatureConfig
) -> dict[str, Column]:
    """The five window statistics feeding lag-1 autocorrelation + slope,
    as pure window aggregates (no arrays, no interpreted lambdas —
    everything stays in WindowExec / whole-stage codegen).

    Emitted as *named columns in their own projection stage*: Catalyst
    does NOT dedupe textually-identical window expressions, so inlining
    these into the autocorr arithmetic would multiply each sliding sum
    ~15× in the physical plan (observed: 62 window exprs vs 11).

    The sums are computed over DECIMAL(38,12) so they are exact and
    order-independent — Spark folds a sliding frame sequentially while
    DuckDB uses a segment tree, so double sums would disagree in the
    last bit; decimal sums cannot.

    Known residual: the per-element double→decimal cast itself is not
    engine-identical for magnitudes where 1e-12 is below the double's
    ulp (Spark rounds the shortest decimal string, DuckDB the exact
    binary expansion), leaving ~1e-17 relative noise on the staged
    sums. Measured effect: 1 row in 89,034 lands one float32 ulp off
    the oracle at sf0.1 (bit-exact at sf0.01). No decimal scale fixes
    this — coarser grids quantize real signal, finer grids diverge more
    (see the measured scale sweep in operators/pipeline.kmeans_update);
    it is the floor of cross-engine float parity for windowed sums of
    arbitrary doubles."""
    w21 = w_day.rowsBetween(-(cfg.window - 1), 0)
    w20 = w_day.rowsBetween(-(cfg.window - 2), 0)
    x = F.col(ma_col)
    dec = "decimal(38,12)"
    # y_col = x·(previous x in day), pre-staged (window functions can't
    # nest); null on the day's first row, so the 20-row sum automatically
    # covers frame positions 1..n−1
    y = F.col(y_col).cast(dec)
    return {
        f"_n_{sfx}": F.count(x).over(w21).cast("double"),
        f"_s_{sfx}": _dec_to_double(F.sum(x.cast(dec)).over(w21)),
        f"_ss_{sfx}": _dec_to_double(F.sum((x * x).cast(dec)).over(w21)),
        f"_p_{sfx}": _dec_to_double(
            F.coalesce(F.sum(y).over(w20), F.lit(0).cast(dec))
        ),
        f"_first_{sfx}": F.first(x).over(w21),
    }


def _window_stat_cols_running(
    ma_col: str, y_col: str, sfx: str, w_day, cfg: FeatureConfig
) -> tuple[dict[str, Column], dict[str, Column]]:
    """:func:`_window_stat_cols` with O(1)-per-row window frames (r15,
    guide §2.4/§1.2 "per-task work"): Spark evaluates a bounded
    ``rowsBetween(-20, 0)`` aggregate by RE-AGGREGATING the whole frame
    for every row (SlidingWindowFunctionFrame), so the six decimal
    sliding sums cost O(window) decimal adds per row. The quantized
    sums are EXACT scaled integers, so each sliding sum equals the
    difference of two RUNNING sums (UnboundedPreceding frames are
    incrementally maintained, O(1)/row) picked up via ``lag`` — decimal
    arithmetic has no rounding at these magnitudes (day-cumulative
    ≤ ~1e21 ≪ the 10^26 capacity of decimal(38,12)), so every derived
    value is bit-identical to the frame-aggregated form (twin-pinned in
    tests/test_features_pipeline.py). first-of-frame becomes
    ``lag(x, window-1)`` with the day's running first as fallback, and
    the frame count is ``least(row_number, window)`` (x is never null).

    Returns TWO projection-stage dicts (running sums, then stats from
    them): referencing a running sum both directly and under ``lag``
    in one projection makes Catalyst materialize it TWICE (it never
    dedupes window expressions — see :func:`_window_stat_cols`), so
    stage 1 names the cumulative columns and stage 2's lags/differences
    reference plain columns. Both stages share one (day, time) sort —
    two adjacent Window nodes, no extra exchange (plan-pinned in
    plans/r15/features_flagship_after.txt).

    The running sums are RE-CAST to decimal(30,12) before the
    difference: a (38,12)−(38,12) result needs precision 39, which
    Spark caps by REDUCING the scale to 11 — silently rounding the
    12th decimal off the quantized grid (measured: 1 row differs at
    sf0.01). (30,12) is exact for any day-cumulative here (integer
    part ≤ 1e18 ≫ the ~1e9 bound of an 86400-bar day of ma² sums)
    and subtracts to (31,12) — no precision-loss path, scale intact."""
    wrun = w_day.rowsBetween(Window.unboundedPreceding, 0)
    x = F.col(ma_col)
    dec = "decimal(38,12)"
    ndec = "decimal(30,12)"
    zero = F.lit(0).cast(ndec)
    y = F.col(y_col).cast(dec)
    cums = {
        f"_cs_{sfx}": F.sum(x.cast(dec)).over(wrun).cast(ndec),
        f"_css_{sfx}": F.sum((x * x).cast(dec)).over(wrun).cast(ndec),
        f"_cp_{sfx}": F.sum(y).over(wrun).cast(ndec),
        f"_dayfirst_{sfx}": F.first(x).over(wrun),
    }
    cs, css, cp = (
        F.col(f"_cs_{sfx}"),
        F.col(f"_css_{sfx}"),
        F.col(f"_cp_{sfx}"),
    )
    stats = {
        f"_n_{sfx}": F.least(
            F.row_number().over(w_day), F.lit(cfg.window)
        ).cast("double"),
        f"_s_{sfx}": _dec_to_double(
            cs - F.coalesce(F.lag(cs, cfg.window).over(w_day), zero)
        ),
        f"_ss_{sfx}": _dec_to_double(
            css - F.coalesce(F.lag(css, cfg.window).over(w_day), zero)
        ),
        f"_p_{sfx}": _dec_to_double(
            F.coalesce(cp, zero)
            - F.coalesce(F.lag(cp, cfg.window - 1).over(w_day), zero)
        ),
        f"_first_{sfx}": F.coalesce(
            F.lag(x, cfg.window - 1).over(w_day),
            F.col(f"_dayfirst_{sfx}"),
        ),
    }
    return cums, stats


def _autocorr_from_stats(ma_col: str, sfx: str, cfg: FeatureConfig) -> Column:
    """Lag-1 autocorrelation from the staged window stats.

    Algebra (identical formula to Common.cs:29-60, expanded):
      m   = s/n
      num = Σ x_i·x_{i−1} − m(Σ_{i≥1}x_i + Σ_{i≥1}x_{i−1}) + (n−1)m²
          = p − m(2s − first − x) + (n−1)m²
      den = Σx² − 2ms + nm²
    Versus the array fold form (functions.autocorr, used by the
    standalone feature_autocorr query) the VALUES may differ by ~1e-15:
    same formula, different-but-pinned rounding order. Each query matches
    its own oracle exactly."""
    x = F.col(ma_col)
    n, s, ss, p, first = (
        F.col(f"_n_{sfx}"),
        F.col(f"_s_{sfx}"),
        F.col(f"_ss_{sfx}"),
        F.col(f"_p_{sfx}"),
        F.col(f"_first_{sfx}"),
    )
    m = s / n
    num = p - m * (F.lit(2.0) * s - first - x) + (n - F.lit(1.0)) * m * m
    den = ss - F.lit(2.0) * m * s + n * m * m
    return (
        F.when(n <= F.lit(float(cfg.autocorr_lag)), F.lit(0.0))
        .when(F.abs(den) < X.TOLERANCE, F.lit(0.0))
        .otherwise(num / den)
    )


def features_df_fused(
    spark: SparkSession,
    sf_dir: str,
    cfg: FeatureConfig = TESTDATA_CONFIG,
) -> DataFrame:
    """ONE-shuffle variant of :func:`features_df`: the whole per-day
    computation (EMA fold, sliding window, autocorr/slope/distance/
    location values, warm-up gate) runs inside a single Arrow-batched
    ``applyInPandas`` group pass, reusing the bit-exact Python math in
    functions/exact.py (the same functions that make the streaming
    operator byte-identical to batch).

    vs the windowed impl: saves the post-Python hash(day) exchange and
    the WindowExec pass — the grouped-map output feeds the export
    projection directly. Per-day groups are tiny (≤ a session of bars),
    so the Python loop is O(window) per row with bounded state, exactly
    the reference's CircularBuffer loop (FeaturesBarService.cs:29-47).
    tests/test_features_pipeline.py asserts fused == windowed to the
    byte."""
    from strategy_analyzer_exporter_spark.functions import exact

    a_f = 2.0 / (cfg.span_fast + 1.0)
    a_s = 2.0 / (cfg.span_slow + 1.0)
    cap = cfg.window
    slope_tol = float(cfg.slope_tolerance)
    bars_required = cfg.bars_required

    bars = bars_df(spark, sf_dir)
    sess = bars.filter(
        (F.col("time") >= cfg.time_start) & (F.col("time") <= cfg.time_end)
    ).select("day", "time", "open", "high", "low", "close", "volume")

    out_schema = T.StructType(
        [
            T.StructField("day", T.IntegerType()),
            T.StructField("time", T.IntegerType()),
            T.StructField("open", T.DoubleType()),
            T.StructField("high", T.DoubleType()),
            T.StructField("low", T.DoubleType()),
            T.StructField("close", T.DoubleType()),
            T.StructField("volume", T.DoubleType()),
            T.StructField("f_moving_average_distance", T.DoubleType()),
            T.StructField("f_moving_average_slow_distance", T.DoubleType()),
            T.StructField("f_moving_average_autocorrelation", T.DoubleType()),
            T.StructField("f_moving_average_slow_autocorrelation", T.DoubleType()),
            T.StructField("f_moving_average_slope", T.DoubleType()),
            T.StructField("f_open_location_value", T.DoubleType()),
            T.StructField("f_close_location_value", T.DoubleType()),
        ]
    )
    cols = [f.name for f in out_schema.fields]

    q12, d12 = exact.q12, exact.d12
    ma_distance, loc_value, sl = exact.ma_distance, exact.loc_value, exact.slope
    TOL = exact.TOL

    class _Win:
        """Sliding window with INCREMENTAL exact-integer decimal sums:
        per row only 3 quantizations (v, v², v·prev) instead of re-summing
        the whole frame — exact-integer add/subtract is associative, so
        the sums are bit-identical to recomputing them from scratch."""

        __slots__ = ("vals", "qv", "qvv", "qp", "s", "ss", "p")

        def __init__(self) -> None:
            self.vals: list[float] = []  # window of MA doubles
            self.qv: list[int] = []  # q12(v) per position
            self.qvv: list[int] = []  # q12(v*v) per position
            self.qp: list[int] = []  # q12(v·prev) per gap (len-1 entries)
            self.s = self.ss = self.p = 0

        def push(self, v: float) -> None:
            if self.vals:
                qp = q12(v * self.vals[-1])
                self.qp.append(qp)
                self.p += qp
            a, b = q12(v), q12(v * v)
            self.vals.append(v)
            self.qv.append(a)
            self.qvv.append(b)
            self.s += a
            self.ss += b
            if len(self.vals) > cap:
                self.s -= self.qv.pop(0)
                self.ss -= self.qvv.pop(0)
                self.p -= self.qp.pop(0)
                self.vals.pop(0)

        def autocorr(self) -> float:
            n = float(len(self.vals))
            if n <= 1.0:
                return 0.0
            s = d12(self.s)
            ss = d12(self.ss)
            p = d12(self.p)
            m = s / n
            first, x = self.vals[0], self.vals[-1]
            num = p - m * (2.0 * s - first - x) + (n - 1.0) * m * m
            den = ss - 2.0 * m * s + n * m * m
            if abs(den) < TOL:
                return 0.0
            return num / den

    def day_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("time", kind="mergesort")
        time_a = pdf["time"].to_numpy()
        day_a = pdf["day"].to_numpy()
        open_a = pdf["open"].to_numpy()
        high_a = pdf["high"].to_numpy()
        low_a = pdf["low"].to_numpy()
        close_a = pdf["close"].to_numpy()
        vol_a = pdf["volume"].to_numpy()
        ema_f = ema_s = None
        win_f, win_s = _Win(), _Win()
        out: list[tuple] = []
        for i in range(len(time_a)):
            c = float(close_a[i])
            if ema_f is None:
                ema_f = ema_s = c
            else:
                ema_f = ema_f + a_f * (c - ema_f)
                ema_s = ema_s + a_s * (c - ema_s)
            win_f.push(ema_f)
            win_s.push(ema_s)
            if i + 1 < bars_required:
                continue
            o, h, lo, v = (
                float(open_a[i]),
                float(high_a[i]),
                float(low_a[i]),
                float(vol_a[i]),
            )
            out.append(
                (
                    int(day_a[i]),
                    int(time_a[i]),
                    o,
                    h,
                    lo,
                    c,
                    v,
                    ma_distance(c, ema_f),
                    ma_distance(c, ema_s),
                    win_f.autocorr(),
                    win_s.autocorr(),
                    sl(win_f.vals, ema_f, slope_tol),
                    loc_value(o, h, lo),
                    loc_value(c, h, lo),
                )
            )
        res = pd.DataFrame(out, columns=cols)
        # explicit dtypes so empty groups (all rows gated) serialize too
        for col in cols:
            res[col] = res[col].astype("int32" if col in ("day", "time") else "float64")
        return res

    feat = sess.groupBy("day").applyInPandas(day_group, out_schema)
    return export_select(feat, use_float32=cfg.use_float32)


def features_df(
    spark: SparkSession,
    sf_dir: str,
    cfg: FeatureConfig = TESTDATA_CONFIG,
    ema_impl: str = "pandas",
    stats_impl: str = "running",
) -> DataFrame:
    """bars → session filter → EMA → window features → warm-up gate →
    alphabetical float32 export projection (FIXTURES.md §2 schema).

    One logical day-partitioning serves the whole plan: bars derivation,
    EMA grouping, and every window feature share hash(day), so after the
    first exchange everything is sorts + window aggregates within
    partitions. Requires cfg.autocorr_lag == 1 (the windowed-sums
    expansion is lag-1; the general-lag array form lives in
    functions.autocorr)."""
    if cfg.autocorr_lag != 1:
        raise ValueError("features_df implements lag-1 autocorrelation")
    bars = bars_df(spark, sf_dir)
    # P3 — session predicate first, like the reference (bars outside the
    # session never enter the buffers). Also lets Catalyst push the
    # filter into the parquet scan of the underlying events table.
    sess = bars.filter(
        (F.col("time") >= cfg.time_start) & (F.col("time") <= cfg.time_end)
    )
    # r14 (guide §4.1 — pass only what the boundary needs): event_id /
    # user_id exist only to derive high/low/volume inside bars_df and
    # never reach the export projection, but applyInPandas is opaque to
    # column pruning, so without this drop they cross the Python
    # boundary both ways (2 of 9 input columns) for nothing.
    sess = sess.drop("event_id", "user_id")
    w_day = Window.partitionBy("day").orderBy("time")
    if ema_impl == "pandas":
        ma = _with_ema_and_lag_products(sess, cfg)
    else:
        ma = with_ema_fold(sess, cfg).withColumns(
            {
                "_y_f": F.col("moving_average") * F.lag("moving_average").over(w_day),
                "_y_s": F.col("slow_moving_average")
                * F.lag("slow_moving_average").over(w_day),
            }
        )
    return _staged_to_export(ma, cfg, stats_impl=stats_impl)


def _staged_to_export(
    ma: DataFrame, cfg: FeatureConfig, stats_impl: str = "running"
) -> DataFrame:
    """Shared pipeline tail: per-day window stats → autocorr/slope/
    distance/location features → per-day warm-up gate → alphabetical
    float32 export projection. ``ma`` must carry day/time/OHLCV plus
    moving_average, slow_moving_average, _y_f, _y_s (within-day lag
    products). ``stats_impl="running"`` (registered default, r15) uses
    O(1)-per-row running-sum/lag frames; ``"frame"`` is the pre-r15
    bounded-frame shape — bit-identical (see
    :func:`_window_stat_cols_running`), twin-pinned."""
    w_day = Window.partitionBy("day").orderBy("time")
    if stats_impl == "running":
        cums_f, stats_f = _window_stat_cols_running(
            "moving_average", "_y_f", "f", w_day, cfg
        )
        cums_s, stats_s = _window_stat_cols_running(
            "slow_moving_average", "_y_s", "s", w_day, cfg
        )
        # two projection stages → two adjacent Window nodes sharing one
        # (day, time) sort: running sums first, O(1) lags/diffs second
        staged = ma.withColumns({**cums_f, **cums_s}).withColumns(
            {**stats_f, **stats_s, "_rn": F.row_number().over(w_day)}
        )
    else:
        # one Window stage, all expressions sharing one (day, time) sort
        stats = {
            **_window_stat_cols("moving_average", "_y_f", "f", w_day, cfg),
            **_window_stat_cols(
                "slow_moving_average", "_y_s", "s", w_day, cfg
            ),
            "_rn": F.row_number().over(w_day),
        }
        staged = ma.withColumns(stats)

    slope_tol = float(cfg.slope_tolerance)
    slope = (
        F.when(F.col("_n_f") < F.lit(2.0), F.lit(0.0))
        .when(F.abs(F.col("_first_f")) < F.lit(slope_tol), F.lit(0.0))
        .otherwise(
            (F.col("moving_average") - F.col("_first_f"))
            / F.col("_first_f")
            * F.lit(100.0)
        )
    )

    feat = staged.select(
        "day",
        "time",
        "open",
        "high",
        "low",
        "close",
        "volume",
        "_rn",
        X.ma_distance("close", "moving_average").alias("f_moving_average_distance"),
        X.ma_distance("close", "slow_moving_average").alias(
            "f_moving_average_slow_distance"
        ),
        _autocorr_from_stats("moving_average", "f", cfg).alias(
            "f_moving_average_autocorrelation"
        ),
        _autocorr_from_stats("slow_moving_average", "s", cfg).alias(
            "f_moving_average_slow_autocorrelation"
        ),
        slope.alias("f_moving_average_slope"),
        X.location_value("open", "high", "low").alias("f_open_location_value"),
        X.location_value("close", "high", "low").alias("f_close_location_value"),
    )
    # P5 — warm-up: emit only once the day's buffer holds ≥ bars_required
    # rows. On the first emitted row the frame holds exactly
    # bars_required rows; afterwards the full `window` rows.
    gated = feat.filter(F.col("_rn") >= cfg.bars_required).drop("_rn")
    return export_select(gated, use_float32=cfg.use_float32)


def features_df_full_ema(
    spark: SparkSession,
    sf_dir: str,
    cfg: FeatureConfig = TESTDATA_CONFIG,
) -> DataFrame:
    """Reference-exact EMA seeding: the EMAs run over the FULL loaded
    bar series — seeded once at series start, advancing on every bar
    including out-of-session ones (the NinjaTrader indicators are bound
    to the series, StrategyAnalyzerExporter.cs:138-139) — while the
    session filter, per-day buffer resets, and warm-up gate behave
    exactly like the flagship (FeaturesBarService.cs:32-44).

    The EMA scan is inherently sequential (a single accumulator over the
    whole series), so it runs as ONE sorted partition streamed through
    Arrow-batched ``mapInPandas`` carrying the accumulators across
    batches — O(n) compute, O(batch) memory. At scale the parallel unit
    is the instrument (the reference is single-instrument, so this
    series IS one group); everything downstream of the EMA is the same
    per-day windowed plan as the flagship."""
    if cfg.autocorr_lag != 1:
        raise ValueError("features_df_full_ema implements lag-1 autocorrelation")
    a_f = 2.0 / (cfg.span_fast + 1.0)
    a_s = 2.0 / (cfg.span_slow + 1.0)

    bars = bars_df(spark, sf_dir).select(
        "day", "time", "open", "high", "low", "close", "volume"
    )
    out_schema = T.StructType(
        bars.schema.fields
        + [
            T.StructField("moving_average", T.DoubleType(), False),
            T.StructField("slow_moving_average", T.DoubleType(), False),
        ]
    )

    def ema_scan(batches):
        acc_f: float | None = None
        acc_s: float | None = None
        for pdf in batches:
            closes = pdf["close"].to_numpy()
            ef = [0.0] * len(closes)
            es = [0.0] * len(closes)
            for i in range(len(closes)):
                c = float(closes[i])
                if acc_f is None:
                    acc_f = acc_s = c
                else:
                    acc_f = acc_f + a_f * (c - acc_f)
                    acc_s = acc_s + a_s * (c - acc_s)
                ef[i] = acc_f
                es[i] = acc_s
            pdf = pdf.copy()
            pdf["moving_average"] = pd.Series(ef, index=pdf.index, dtype="float64")
            pdf["slow_moving_average"] = pd.Series(es, index=pdf.index, dtype="float64")
            yield pdf

    ma_all = (
        bars.repartition(1)
        .sortWithinPartitions("day", "time")
        .mapInPandas(ema_scan, out_schema)
    )
    # session filter AFTER the EMA — out-of-session bars advanced the
    # accumulators but never enter the buffers (reference order:
    # indicator update happens on every bar, the time gate only guards
    # GetFeaturesBar)
    sess = ma_all.filter(
        (F.col("time") >= cfg.time_start) & (F.col("time") <= cfg.time_end)
    )
    w_day = Window.partitionBy("day").orderBy("time")
    ma = sess.withColumns(
        {
            "_y_f": F.col("moving_average") * F.lag("moving_average").over(w_day),
            "_y_s": F.col("slow_moving_average")
            * F.lag("slow_moving_average").over(w_day),
        }
    )
    return _staged_to_export(ma, cfg)


def _autocorr_win_sql(sfx: str, lag: int) -> str:
    """DuckDB mirror of _windowed_autocorr_cols' double arithmetic."""
    m = f"(s_{sfx} / n_{sfx})"
    x = "moving_average" if sfx == "f" else "slow_moving_average"
    num = f"(p_{sfx} - {m} * (2.0 * s_{sfx} - first_{sfx} - {x}) + (n_{sfx} - 1.0) * {m} * {m})"
    den = f"(ss_{sfx} - 2.0 * {m} * s_{sfx} + n_{sfx} * {m} * {m})"
    return (
        f"CASE WHEN n_{sfx} <= {float(lag)!r} THEN 0.0 "
        f"WHEN abs({den}) < 1e-6 THEN 0.0 "
        f"ELSE {num} / {den} END"
    )


def _features_tail_sql(cfg: FeatureConfig) -> str:
    """SQL twin of :func:`_staged_to_export`: the pipeline tail from an
    upstream CTE named ``ma`` (day/time/OHLCV + moving_average +
    slow_moving_average) through lag products, exact-decimal window
    stats, features, warm-up gate, and the export projection."""
    real = "REAL" if cfg.use_float32 else "DOUBLE"
    dec = "DECIMAL(38,12)"
    d2d = lambda e: f"CAST(CAST({e} AS VARCHAR) AS DOUBLE)"  # noqa: E731
    win_cols = []
    for sfx, x in (("f", "moving_average"), ("s", "slow_moving_average")):
        win_cols += [
            f"CAST(count({x}) OVER w21 AS DOUBLE) AS n_{sfx}",
            f"{d2d(f'sum(CAST({x} AS {dec})) OVER w21')} AS s_{sfx}",
            f"{d2d(f'sum(CAST({x} * {x} AS {dec})) OVER w21')} AS ss_{sfx}",
            f"{d2d(f'coalesce(sum(CAST(_y_{sfx} AS {dec})) OVER w20, CAST(0 AS {dec}))')} AS p_{sfx}",
            f"first_value({x}) OVER w21 AS first_{sfx}",
        ]
    win_cols_sql = ",\n           ".join(win_cols)
    slope_tol = float(cfg.slope_tolerance)
    return f"""ma2 AS (
    SELECT *,
           moving_average * lag(moving_average) OVER wd AS _y_f,
           slow_moving_average * lag(slow_moving_average) OVER wd AS _y_s
    FROM ma
    WINDOW wd AS (PARTITION BY day ORDER BY time)
),
win AS (
    SELECT *,
           {win_cols_sql},
           row_number() OVER (PARTITION BY day ORDER BY time) AS _rn
    FROM ma2
    WINDOW w21 AS (PARTITION BY day ORDER BY time
                 ROWS BETWEEN {cfg.window - 1} PRECEDING AND CURRENT ROW),
           w20 AS (PARTITION BY day ORDER BY time
                 ROWS BETWEEN {cfg.window - 2} PRECEDING AND CURRENT ROW)
),
feat AS (
    SELECT day, time, open, high, low, close, volume,
           {X.ma_distance_sql('close', 'moving_average')} AS f_moving_average_distance,
           {X.ma_distance_sql('close', 'slow_moving_average')} AS f_moving_average_slow_distance,
           {_autocorr_win_sql('f', cfg.autocorr_lag)} AS f_moving_average_autocorrelation,
           {_autocorr_win_sql('s', cfg.autocorr_lag)} AS f_moving_average_slow_autocorrelation,
           CASE WHEN n_f < 2.0 THEN 0.0
                WHEN abs(first_f) < CAST({slope_tol!r} AS DOUBLE) THEN 0.0
                ELSE (moving_average - first_f) / first_f * 100.0
           END AS f_moving_average_slope,
           {X.location_value_sql('open', 'high', 'low')} AS f_open_location_value,
           {X.location_value_sql('close', 'high', 'low')} AS f_close_location_value
    FROM win
    WHERE _rn >= {cfg.bars_required}
)
SELECT
    CAST(close AS {real}) AS close,
    day,
    CAST(f_close_location_value AS {real}) AS f_close_location_value,
    CAST(f_moving_average_autocorrelation AS {real}) AS f_moving_average_autocorrelation,
    CAST(f_moving_average_distance AS {real}) AS f_moving_average_distance,
    CAST(f_moving_average_slope AS {real}) AS f_moving_average_slope,
    CAST(f_moving_average_slow_autocorrelation AS {real}) AS f_moving_average_slow_autocorrelation,
    CAST(f_moving_average_slow_distance AS {real}) AS f_moving_average_slow_distance,
    CAST(f_open_location_value AS {real}) AS f_open_location_value,
    CAST(high AS {real}) AS high,
    CAST(low AS {real}) AS low,
    CAST(open AS {real}) AS open,
    time,
    CAST(volume AS {real}) AS volume
FROM feat"""


def features_sql(cfg: FeatureConfig = TESTDATA_CONFIG) -> str:
    """DuckDB oracle for :func:`features_df` — same op sequence: EMA by
    left-fold over per-day prefix lists, autocorrelation by exact-decimal
    window sums expanded exactly like _window_stat_cols."""
    ema_f = X.ema_fold_sql("_closes", cfg.span_fast)
    ema_s = X.ema_fold_sql("_closes", cfg.span_slow)
    return f"""
WITH {BARS_CTE},
sess AS (
    SELECT * FROM bars
    WHERE time >= {cfg.time_start} AND time <= {cfg.time_end}
),
pfx AS (
    SELECT *, list(close) OVER (
        PARTITION BY day ORDER BY time
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _closes
    FROM sess
),
ma AS (
    SELECT day, time, open, high, low, close, volume,
           {ema_f} AS moving_average,
           {ema_s} AS slow_moving_average
    FROM pfx
),
{_features_tail_sql(cfg)}
""".strip()


def features_full_ema_sql(cfg: FeatureConfig = TESTDATA_CONFIG) -> str:
    """DuckDB oracle for :func:`features_df_full_ema`.

    The continuously-seeded EMA is a sequential fold over the whole
    series — naively that's an O(n²) global prefix-list fold. Instead
    the fold is blocked BY DAY: a recursive CTE carries each day's
    ending accumulator into the next day's fold (26 iterations, one
    small list fold each), and per-row EMAs fold only the day-local
    prefix seeded with the carried accumulator — O(Σ day²) like the
    flagship oracle, while executing the exact same float op sequence
    as the global fold (a seeded left-fold is position-wise identical
    to continuing the unseeded one)."""
    fold_f = lambda arr: X.ema_fold_sql(arr, cfg.span_fast)  # noqa: E731
    fold_s = lambda arr: X.ema_fold_sql(arr, cfg.span_slow)  # noqa: E731
    return f"""
WITH RECURSIVE {BARS_CTE},
dl AS (
    SELECT day, row_number() OVER (ORDER BY day) AS rn,
           list(close ORDER BY time) AS cs
    FROM bars GROUP BY day
),
rec AS (
    SELECT rn, day, {fold_f('cs')} AS ef_end, {fold_s('cs')} AS es_end
    FROM dl WHERE rn = 1
    UNION ALL
    SELECT d.rn, d.day,
           {fold_f('[r.ef_end] || d.cs')} AS ef_end,
           {fold_s('[r.es_end] || d.cs')} AS es_end
    FROM rec r JOIN dl d ON d.rn = r.rn + 1
),
seeds AS (
    SELECT day,
           lag(ef_end) OVER (ORDER BY rn) AS ef_seed,
           lag(es_end) OVER (ORDER BY rn) AS es_seed
    FROM rec
),
pfx AS (
    SELECT b.*, list(close) OVER (
        PARTITION BY day ORDER BY time
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _closes
    FROM bars b
),
ma_all AS (
    SELECT p.day, p.time, p.open, p.high, p.low, p.close, p.volume,
           CASE WHEN s.ef_seed IS NULL THEN {fold_f('p._closes')}
                ELSE {fold_f('[s.ef_seed] || p._closes')} END AS moving_average,
           CASE WHEN s.es_seed IS NULL THEN {fold_s('p._closes')}
                ELSE {fold_s('[s.es_seed] || p._closes')} END AS slow_moving_average
    FROM pfx p JOIN seeds s ON s.day = p.day
),
ma AS (
    SELECT * FROM ma_all
    WHERE time >= {cfg.time_start} AND time <= {cfg.time_end}
),
{_features_tail_sql(cfg)}
""".strip()
