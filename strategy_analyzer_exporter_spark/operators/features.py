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
    argument-swap quirk: MovingAverage.cs:30 passes
    ``LookbackPeriodSlow`` (21) as CalculateSlope's *tolerance*
    parameter, so the slope zeroes out whenever |first| < 21. Default
    False = the intended semantics (tolerance 1e-6). SURVEY.md §2.3."""

    span_fast: int = 9  # EMA fast period (StrategyAnalyzerExporter.cs:138)
    span_slow: int = 21  # EMA slow period (:139)
    window: int = 21  # circular-buffer capacity (FeaturesBarService.cs:22)
    bars_required: int = 20  # warm-up threshold (StrategyAnalyzerExporter.cs:86)
    time_start: int = 90000  # session start HHmmss (:96)
    time_end: int = 155500  # session end HHmmss (:97)
    autocorr_lag: int = 1  # MovingAverage.cs:23-28
    use_float32: bool = True  # UseFloat32 (:94)
    strict_reference_tolerance: bool = False

    @property
    def slope_tolerance(self) -> float:
        return float(self.span_slow) if self.strict_reference_tolerance else X.TOLERANCE


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


def features_df(
    spark: SparkSession,
    sf_dir: str,
    cfg: FeatureConfig = TESTDATA_CONFIG,
    ema_impl: str = "pandas",
) -> DataFrame:
    """bars → session filter → EMA → window features → warm-up gate →
    alphabetical float32 export projection (FIXTURES.md §2 schema)."""
    bars = bars_df(spark, sf_dir)
    # P3 — session predicate first, like the reference (bars outside the
    # session never enter the buffers). Also lets Catalyst push the
    # filter into the parquet scan of the underlying events table.
    sess = bars.filter(
        (F.col("time") >= cfg.time_start) & (F.col("time") <= cfg.time_end)
    )
    ma = (with_ema if ema_impl == "pandas" else with_ema_fold)(sess, cfg)

    w_day = Window.partitionBy("day").orderBy("time")
    w_frame = w_day.rowsBetween(-(cfg.window - 1), 0)
    arr_f = F.collect_list("moving_average").over(w_frame)
    arr_s = F.collect_list("slow_moving_average").over(w_frame)

    feat = ma.select(
        "day",
        "time",
        "open",
        "high",
        "low",
        "close",
        "volume",
        F.row_number().over(w_day).alias("_rn"),
        X.ma_distance("close", "moving_average").alias("f_moving_average_distance"),
        X.ma_distance("close", "slow_moving_average").alias(
            "f_moving_average_slow_distance"
        ),
        X.autocorr(arr_f, cfg.autocorr_lag).alias("f_moving_average_autocorrelation"),
        X.autocorr(arr_s, cfg.autocorr_lag).alias(
            "f_moving_average_slow_autocorrelation"
        ),
        X.slope(arr_f, cfg.slope_tolerance).alias("f_moving_average_slope"),
        X.location_value("open", "high", "low").alias("f_open_location_value"),
        X.location_value("close", "high", "low").alias("f_close_location_value"),
    )
    # P5 — warm-up: emit only once the day's buffer holds ≥ bars_required
    # rows. On the first emitted row the frame holds exactly
    # bars_required rows; afterwards the full `window` rows.
    gated = feat.filter(F.col("_rn") >= cfg.bars_required).drop("_rn")
    return export_select(gated, use_float32=cfg.use_float32)


def features_sql(cfg: FeatureConfig = TESTDATA_CONFIG) -> str:
    """DuckDB oracle for :func:`features_df` — same ops, same fold order."""
    ema_f = X.ema_fold_sql("_closes", cfg.span_fast)
    ema_s = X.ema_fold_sql("_closes", cfg.span_slow)
    real = "REAL" if cfg.use_float32 else "DOUBLE"
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
win AS (
    SELECT *,
           list(moving_average) OVER w AS _arr_f,
           list(slow_moving_average) OVER w AS _arr_s,
           row_number() OVER (PARTITION BY day ORDER BY time) AS _rn
    FROM ma
    WINDOW w AS (PARTITION BY day ORDER BY time
                 ROWS BETWEEN {cfg.window - 1} PRECEDING AND CURRENT ROW)
),
feat AS (
    SELECT day, time, open, high, low, close, volume,
           {X.ma_distance_sql('close', 'moving_average')} AS f_moving_average_distance,
           {X.ma_distance_sql('close', 'slow_moving_average')} AS f_moving_average_slow_distance,
           {X.autocorr_sql('_arr_f', cfg.autocorr_lag)} AS f_moving_average_autocorrelation,
           {X.autocorr_sql('_arr_s', cfg.autocorr_lag)} AS f_moving_average_slow_autocorrelation,
           {X.slope_sql('_arr_f', cfg.slope_tolerance)} AS f_moving_average_slope,
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
FROM feat
""".strip()
