"""Relational surface, batch 6: percentile-clamp winsorization, z-score
outlier detection, and a hierarchical time rollup built from mergeable
partials (the continuous-aggregate / hypertable pattern).

Determinism: thresholds are percentile_disc-style — an ACTUAL data
value picked by row position, never an interpolation — and every float
output is a pinned sequence of correctly-rounded IEEE ops on exact-sum
inputs (see functions.dsum and the cross-engine parity notes in
finance.py / pipeline3.py).

Scale design (100 TB):
- winsorize: rank-based thresholds need one sort shuffle per group key;
  the clamp pass re-aggregates on the same key, so AQE reuses the
  exchange. Thresholds relation is 1 row per group — broadcast.
- z-score: two scans (moments, then flag) — the moments relation is
  tiny and broadcasts; no row-vs-row comparison anywhere.
- time rollup: ONE scan builds the finest level; every coarser level
  re-aggregates the previous level's partials (counts/sums/min/max are
  mergeable) — this is how a lakehouse keeps a 100 TB hypertable's
  hourly/daily rollups fresh without rescanning raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from strategy_analyzer_exporter_spark.functions import dsum, dsum_sql
from strategy_analyzer_exporter_spark.registry import register
from strategy_analyzer_exporter_spark.sources.bars import BARS_CTE, bars_df
from strategy_analyzer_exporter_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Winsorization: clamp l_extendedprice to [p05, p95] per return flag.
# percentile_disc semantics (value at ceil(q·n), 1-based) — an actual
# element, identical in any engine that can sort.

W_LO, W_HI = 0.05, 0.95


def _q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("l_returnflag")).alias("_n"),
    )
    idx_lo = F.ceil(F.lit(W_LO) * F.col("_n").cast("double"))
    idx_hi = F.ceil(F.lit(W_HI) * F.col("_n").cast("double"))
    thresholds = ranked.groupBy("l_returnflag").agg(
        F.max(F.when(F.col("_rn") == idx_lo, F.col("l_extendedprice"))).alias("lo"),
        F.max(F.when(F.col("_rn") == idx_hi, F.col("l_extendedprice"))).alias("hi"),
    )
    clamped = li.join(F.broadcast(thresholds), "l_returnflag").select(
        "l_returnflag",
        "l_extendedprice",
        "lo",
        "hi",
        F.least(F.greatest("l_extendedprice", "lo"), F.col("hi")).alias("_w"),
    )
    return clamped.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("lo").alias("p05"),
        F.min("hi").alias("p95"),
        F.sum((F.col("l_extendedprice") < F.col("lo")).cast("long")).alias(
            "n_clamped_low"
        ),
        F.sum((F.col("l_extendedprice") > F.col("hi")).cast("long")).alias(
            "n_clamped_high"
        ),
        dsum("_w").alias("winsorized_sum"),
    )


_WINSORIZE_ORACLE = f"""WITH ranked AS (
    SELECT l_returnflag, l_extendedprice,
           row_number() OVER (PARTITION BY l_returnflag
                              ORDER BY l_extendedprice) AS _rn,
           count(*) OVER (PARTITION BY l_returnflag) AS _n
    FROM lineitem
),
thresholds AS (
    SELECT l_returnflag,
           max(CASE WHEN _rn = ceil({W_LO} * CAST(_n AS DOUBLE))
               THEN l_extendedprice END) AS lo,
           max(CASE WHEN _rn = ceil({W_HI} * CAST(_n AS DOUBLE))
               THEN l_extendedprice END) AS hi
    FROM ranked GROUP BY l_returnflag
),
clamped AS (
    SELECT li.l_returnflag, li.l_extendedprice, t.lo, t.hi,
           least(greatest(li.l_extendedprice, t.lo), t.hi) AS _w
    FROM lineitem li JOIN thresholds t USING (l_returnflag)
)
SELECT l_returnflag, count(*) AS n_rows,
       min(lo) AS p05, min(hi) AS p95,
       CAST(sum(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clamped_low,
       CAST(sum(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT)
           AS n_clamped_high,
       {dsum_sql('_w')} AS winsorized_sum
FROM clamped GROUP BY l_returnflag"""

register("winsorize_prices", _q_winsorize, _WINSORIZE_ORACLE)


# ---------------------------------------------------------------------------
# Z-score outliers: flag events whose value is > 3σ from the per-type
# mean. Moments come from exact decimal sums; mean/var/std/z are the
# SAME pinned op sequence in both engines.

Z_CUT = 3.0


def _moments(ev: DataFrame) -> DataFrame:
    dec = "decimal(38,10)"
    s = F.sum(F.col("value").cast(dec)).cast("string").cast("double")
    ss = (
        F.sum((F.col("value") * F.col("value")).cast(dec))
        .cast("string")
        .cast("double")
    )
    n = F.count(F.lit(1)).cast("double")
    g = ev.groupBy("event_type").agg(s.alias("_s"), ss.alias("_ss"), n.alias("_n"))
    mean = F.col("_s") / F.col("_n")
    var = F.col("_ss") / F.col("_n") - mean * mean
    return g.select(
        "event_type",
        mean.alias("_mean"),
        F.when(var > 0, F.sqrt(var)).alias("_std"),
    )


def _q_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    m = _moments(ev)
    z = (F.col("value") - F.col("_mean")) / F.col("_std")
    return (
        ev.join(F.broadcast(m), "event_type")
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > Z_CUT)
        .select("event_id", "event_type", "value", "z")
    )


_ZSCORE_ORACLE = f"""WITH m AS (
    SELECT event_type,
           {dsum_sql('value')} / CAST(count(*) AS DOUBLE) AS _mean,
           {dsum_sql('value * value')} / CAST(count(*) AS DOUBLE)
               - ({dsum_sql('value')} / CAST(count(*) AS DOUBLE))
               * ({dsum_sql('value')} / CAST(count(*) AS DOUBLE)) AS _var
    FROM events GROUP BY event_type
),
ms AS (
    SELECT event_type, _mean,
           CASE WHEN _var > 0 THEN sqrt(_var) END AS _std
    FROM m
)
SELECT e.event_id, e.event_type, e.value,
       (e.value - ms._mean) / ms._std AS z
FROM events e JOIN ms USING (event_type)
WHERE abs((e.value - ms._mean) / ms._std) > {Z_CUT}"""

register("events_zscore_outliers", _q_zscore, _ZSCORE_ORACLE)


# ---------------------------------------------------------------------------
# Hierarchical time rollup: minute → 5-minute → hour → day, each level
# re-aggregated FROM THE PREVIOUS LEVEL'S PARTIALS (never from raw
# rows). Volumes in exact integer cents; high/low are min/max (mergeable).
# `time` is HHmmss: minute key = HHmm, 5-min key = HHmm - mm%5.


def _q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars_df(spark, sf_dir)
    v_cents = F.floor(F.col("volume") * 100 + F.lit(0.5)).cast("long")
    minute = b.groupBy(
        "day", (F.floor(F.col("time") / 100)).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_bars"),
        F.sum(v_cents).alias("vol_cents"),
        F.max("high").alias("hi"),
        F.min("low").alias("lo"),
    )

    def merge(df: DataFrame, key) -> DataFrame:
        return df.groupBy("day", key.alias("bucket")).agg(
            F.sum("n_bars").alias("n_bars"),
            F.sum("vol_cents").alias("vol_cents"),
            F.max("hi").alias("hi"),
            F.min("lo").alias("lo"),
        )

    five = merge(minute, F.col("bucket") - F.col("bucket") % 5)
    hour = merge(five, (F.floor(F.col("bucket") / 100)).cast("long"))
    day = merge(hour, F.lit(-1).cast("long"))

    def lab(df: DataFrame, level: str) -> DataFrame:
        return df.select(
            F.lit(level).alias("level"), "day", "bucket",
            "n_bars", "vol_cents", "hi", "lo",
        )

    return (
        lab(minute, "minute")
        .unionByName(lab(five, "5min"))
        .unionByName(lab(hour, "hour"))
        .unionByName(lab(day, "day"))
    )


_ROLLUP_ORACLE = f"""WITH {BARS_CTE},
staged AS (
    SELECT day, time,
           CAST(floor(time / 100) AS BIGINT) AS minute_b,
           CAST(floor(volume * 100 + 0.5) AS BIGINT) AS v_cents,
           high, low
    FROM bars
),
lv_minute AS (
    SELECT 'minute' AS level, day, minute_b AS bucket, count(*) AS n_bars,
           CAST(sum(v_cents) AS BIGINT) AS vol_cents,
           max(high) AS hi, min(low) AS lo
    FROM staged GROUP BY day, minute_b
),
lv_5min AS (
    SELECT '5min' AS level, day, bucket - bucket % 5 AS bucket,
           CAST(sum(n_bars) AS BIGINT) AS n_bars,
           CAST(sum(vol_cents) AS BIGINT) AS vol_cents,
           max(hi) AS hi, min(lo) AS lo
    FROM lv_minute GROUP BY day, bucket - bucket % 5
),
lv_hour AS (
    SELECT 'hour' AS level, day, CAST(floor(bucket / 100) AS BIGINT) AS bucket,
           CAST(sum(n_bars) AS BIGINT) AS n_bars,
           CAST(sum(vol_cents) AS BIGINT) AS vol_cents,
           max(hi) AS hi, min(lo) AS lo
    FROM lv_5min GROUP BY day, CAST(floor(bucket / 100) AS BIGINT)
),
lv_day AS (
    SELECT 'day' AS level, day, CAST(-1 AS BIGINT) AS bucket,
           CAST(sum(n_bars) AS BIGINT) AS n_bars,
           CAST(sum(vol_cents) AS BIGINT) AS vol_cents,
           max(hi) AS hi, min(lo) AS lo
    FROM lv_hour GROUP BY day
)
SELECT * FROM lv_minute UNION ALL
SELECT * FROM lv_5min UNION ALL
SELECT * FROM lv_hour UNION ALL
SELECT * FROM lv_day"""

register("rollup_time_hierarchy", _q_time_rollup, _ROLLUP_ORACLE)
