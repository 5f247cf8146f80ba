"""Time-bucket resampling (hypertable-rollup pattern) and skew-safe
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strategy_analyzer_exporter_spark import functions as X
from strategy_analyzer_exporter_spark.registry import register
from strategy_analyzer_exporter_spark.sources.bars import BARS_CTE, bars_df
from strategy_analyzer_exporter_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# OHLCV resample: 1-second bars → 5-minute bars. The continuous-aggregate
# / hypertable-rollup analogue: open = first by time (min_by), close =
# last by time (max_by), high/low = extrema, volume = exact sum. Bucket
# arithmetic stays in the reference's HHmmss integer encoding. One
# hash-agg on (day, bucket) — partial map-side combine; no window needed.


def _q_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars_df(spark, sf_dir)
    minutes = F.floor(F.col("time") / 100) % 100
    bucket = (
        F.floor(F.col("time") / 10000) * 10000
        + (minutes - minutes % 5) * 100
    ).cast("int")
    return (
        b.withColumn("bucket", bucket)
        .groupBy("day", "bucket")
        .agg(
            F.min_by("open", "time").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", "time").alias("close"),
            X.dsum("volume").alias("volume"),
            F.count(F.lit(1)).alias("n_bars"),
        )
    )


register(
    "bars_resample_5min",
    _q_resample,
    f"""WITH {BARS_CTE}
SELECT day,
       CAST(floor(time/10000)*10000
            + (floor(time/100)%100 - floor(time/100)%100 % 5)*100 AS INTEGER) AS bucket,
       arg_min(open, time) AS open,
       max(high) AS high,
       min(low) AS low,
       arg_max(close, time) AS close,
       {X.dsum_sql('volume')} AS volume,
       count(*) AS n_bars
FROM bars
GROUP BY 1, 2""",
)


# ---------------------------------------------------------------------------
# Salted two-phase aggregation — the skew pattern: phase 1 aggregates on
# (key, salt) spreading a hot key over S reducers; phase 2 merges the S
# partials. Results are identical to direct aggregation (decimal sums
# are order-independent), so the direct SQL is the oracle. At 100 TB this
# is the fallback when one event_type dominates and AQE's skew handling
# isn't enough (it only splits join partitions, not agg groups).
#
# Measured caveat (r06 skew audit, 30%-hot-key corpus, 1M rows): for
# ALGEBRAIC aggregates (sum/count/min/max) the direct groupBy already
# neutralizes hot keys — map-side partial aggregation reduces each key
# to one row per map task before the shuffle, so salting only added a
# second shuffle (0.65 s vs 0.51 s direct). Reach for this shape when
# per-key reducer STATE is what explodes (collect_list/percentile/
# count_distinct intermediates), not for combinable aggregates.

N_SALTS = 8


def _q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(38,10)"
    salted = ev.withColumn("_salt", (F.col("event_id") % N_SALTS).cast("int"))
    phase1 = salted.groupBy("event_type", "_salt").agg(
        F.sum(F.col("value").cast(dec)).alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    )
    return phase1.groupBy("event_type").agg(
        F.sum("_s").cast("string").cast("double").alias("sum_value"),
        F.sum("_n").alias("n_events"),
    )


register(
    "agg_salted_two_phase",
    _q_salted_agg,
    f"""SELECT event_type,
       {X.dsum_sql('value')} AS sum_value,
       count(*) AS n_events
FROM events GROUP BY event_type""",
)
