"""Additional operator queries: streaming parity, per-instrument EMA,
reference-quirk variants, sessionization, exact stats, unpivot.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from strategy_analyzer_exporter_spark import functions as X
from strategy_analyzer_exporter_spark.codecs import ts_to_day, ts_to_time
from strategy_analyzer_exporter_spark.operators.features import (
    TESTDATA_CONFIG,
    FeatureConfig,
    features_sql,
)
from strategy_analyzer_exporter_spark.registry import register
from strategy_analyzer_exporter_spark.sources.bars import BARS_CTE, bars_df
from strategy_analyzer_exporter_spark.sources.staging import staging_root
from strategy_analyzer_exporter_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Streaming pipeline (W1-W9 + P3/P5 incrementally, §2.5): bit-exact vs
# batch, so it shares the batch oracle.


_STAGED: set[str] = set()


def _q_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strategy_analyzer_exporter_spark.streaming import (
        BAR_SCHEMA,
        run_stream_to_memory,
    )

    stage = os.path.join(staging_root(), "bars_stream_" + sf_dir.strip("/").split("/")[-1])
    # one file per day → every day's bars arrive time-ordered within one
    # micro-batch; days may split across batches arbitrarily. The source
    # parquet is immutable test data, so stage once per process (bench
    # re-invokes this query several times; restaging would re-measure
    # the batch writer, not the stream).
    if stage not in _STAGED:
        bars = bars_df(spark, sf_dir).select([f.name for f in BAR_SCHEMA.fields])
        bars.write.mode("overwrite").partitionBy("day").parquet(stage)
        _STAGED.add(stage)
    name = "stream_features_" + abs(hash(sf_dir)).__str__()[:8]
    # Default 15 day-files per micro-batch: multiple batches, so the
    # driver's correctness run exercises cross-batch state continuity
    # (the 1-file-per-trigger path is covered by
    # tests/test_streaming_sinks.py). SPARK_GRAFT_STREAM_MFPT overrides:
    # bench.py sets it high enough for a single batch, so the bench
    # measures state-operator throughput, not per-trigger fixed cost
    # (state-store round-trip + memory-sink collect, ~1.4s/batch);
    # results are bit-equal either way (asserted in
    # tests/test_streaming_sinks.py::test_single_batch_equals_default).
    # 16 state partitions: the corpus has ~30 live day-keys, and each
    # state partition costs a store-commit + Python round-trip per batch
    # (run_stream_to_memory docstring); results are bit-equal at any
    # partitioning. Overridable the same way MFPT is.
    return run_stream_to_memory(
        spark, stage, TESTDATA_CONFIG, query_name=name,
        max_files_per_trigger=int(os.environ.get("SPARK_GRAFT_STREAM_MFPT", "15")),
        state_partitions=int(os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTS", "16")),
    )


register("streaming_features", _q_streaming, features_sql(TESTDATA_CONFIG))


def _q_streaming_lagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's one-behind-close export (§2.5 output lag,
    StrategyAnalyzerExporter.cs:207-215): export_lag_bars=1 holds each
    day's in-flight row in state, so exactly the last bar of every day
    never emits. Oracle = the batch feature oracle minus each day's
    final row."""
    import dataclasses

    from strategy_analyzer_exporter_spark.streaming import (
        BAR_SCHEMA,
        run_stream_to_memory,
    )

    stage = os.path.join(
        staging_root(), "bars_stream_" + sf_dir.strip("/").split("/")[-1]
    )
    if stage not in _STAGED:
        bars = bars_df(spark, sf_dir).select([f.name for f in BAR_SCHEMA.fields])
        bars.write.mode("overwrite").partitionBy("day").parquet(stage)
        _STAGED.add(stage)
    cfg = dataclasses.replace(TESTDATA_CONFIG, export_lag_bars=1)
    name = "stream_feats_lag_" + abs(hash(sf_dir)).__str__()[:8]
    return run_stream_to_memory(
        spark, stage, cfg, query_name=name,
        max_files_per_trigger=int(os.environ.get("SPARK_GRAFT_STREAM_MFPT", "15")),
        state_partitions=int(os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTS", "16")),
    )


def _lagged_oracle() -> str:
    from strategy_analyzer_exporter_spark.streaming import FEATURE_SCHEMA

    cols = ", ".join(f.name for f in FEATURE_SCHEMA.fields)
    return f"""SELECT {cols} FROM (
    SELECT *, row_number() OVER (PARTITION BY day ORDER BY time DESC) AS _rn
    FROM ({features_sql(TESTDATA_CONFIG)})
) WHERE _rn > 1"""


register("streaming_features_lagged", _q_streaming_lagged, _lagged_oracle())


def _q_streaming_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strategy_analyzer_exporter_spark.streaming import (
        run_windowed_counts_to_memory,
    )

    name = "stream_counts_" + abs(hash(sf_dir)).__str__()[:8]
    return run_windowed_counts_to_memory(spark, sf_dir, query_name=name)


register(
    "streaming_windowed_counts",
    _q_streaming_counts,
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events
FROM events GROUP BY 1, 2""",
)


def _q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strategy_analyzer_exporter_spark.streaming import (
        run_streaming_dedup_to_memory,
    )

    name = "stream_dedup_" + abs(hash(sf_dir)).__str__()[:8]
    return run_streaming_dedup_to_memory(spark, sf_dir, query_name=name)


register(
    "streaming_dedup",
    _q_streaming_dedup,
    "SELECT DISTINCT user_id, event_type FROM events",
)


def _q_streaming_dedup_wm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strategy_analyzer_exporter_spark.streaming import (
        run_streaming_dedup_watermarked_to_memory,
    )

    name = "stream_dedup_wm_" + abs(hash(sf_dir)).__str__()[:8]
    return run_streaming_dedup_watermarked_to_memory(spark, sf_dir, query_name=name)


register(
    "streaming_dedup_watermarked",
    _q_streaming_dedup_wm,
    """SELECT DISTINCT user_id, event_type, date_trunc('day', ts) AS day FROM events""",
)


def _q_streaming_running_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strategy_analyzer_exporter_spark.streaming import (
        run_streaming_running_counts_to_memory,
    )

    name = "stream_running_" + abs(hash(sf_dir)).__str__()[:8]
    return run_streaming_running_counts_to_memory(spark, sf_dir, query_name=name)


register(
    "streaming_running_counts",
    _q_streaming_running_counts,
    """SELECT user_id, event_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS BIGINT) AS running_n
FROM events""",
)


def _q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strategy_analyzer_exporter_spark.streaming import (
        run_session_windows_to_memory,
    )

    name = "stream_sessions_" + abs(hash(sf_dir)).__str__()[:8]
    return run_session_windows_to_memory(spark, sf_dir, query_name=name)


# session_window merges on strict window overlap, so a gap of exactly
# 1800s starts a NEW session — the island break below is `>= 1800`
# (the batch sessionization query's break is `> 1800`; both are valid
# session semantics, the streaming one mirrors Spark's operator)
register(
    "streaming_sessions",
    _q_streaming_sessions,
    """WITH marked AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * 1000000
                THEN 1 ELSE 0 END AS _new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
    SELECT *, sum(_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM marked
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, sid""",
)


def _q_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strategy_analyzer_exporter_spark.streaming import (
        run_interval_join_to_memory,
    )

    name = "stream_ijoin_" + abs(hash(sf_dir)).__str__()[:8]
    return run_interval_join_to_memory(spark, sf_dir, query_name=name)


register(
    "streaming_interval_join",
    _q_streaming_interval_join,
    """SELECT c.user_id,
       c.event_id AS clk_event_id,
       e.event_id AS err_event_id,
       c.ts AS clk_ts,
       e.ts AS err_ts
FROM events c JOIN events e
  ON c.user_id = e.user_id
 AND c.event_type = 'click' AND e.event_type = 'error'
 AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 5 MINUTE""",
)


# ---------------------------------------------------------------------------
# W1/W2 at instrument granularity: EMA over the FULL series per user_id
# (the reference's EMA is not day-reset; user_id plays the instrument
# key, SURVEY.md §2.3 W1). applyInPandas per instrument = the scale
# path (parallelism = #instruments); oracle = per-user prefix-list fold.


def _q_ema_instrument(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        ts_to_day("ts").alias("day"),
        ts_to_time("ts").alias("time"),
        (F.lit(100.0) + F.col("value")).alias("close"),
    )
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("day", T.IntegerType()),
            T.StructField("time", T.IntegerType()),
            T.StructField("close", T.DoubleType()),
            T.StructField("ema_fast", T.DoubleType()),
            T.StructField("ema_slow", T.DoubleType()),
        ]
    )
    a_f = 2.0 / (9 + 1.0)
    a_s = 2.0 / (21 + 1.0)

    def ema_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["day", "time", "event_id"], kind="mergesort").reset_index(
            drop=True
        )
        for alpha, col in ((a_f, "ema_fast"), (a_s, "ema_slow")):
            out = [0.0] * len(pdf)
            acc = None
            for i, c in enumerate(float(v) for v in pdf["close"]):
                acc = c if acc is None else acc + alpha * (c - acc)
                out[i] = acc
            pdf[col] = pd.Series(out, dtype="float64")
        return pdf

    return base.groupBy("user_id").applyInPandas(ema_user, out_schema)


register(
    "feature_ema_full_series",
    _q_ema_instrument,
    f"""WITH base AS (
    SELECT user_id, event_id,
           CAST(year(ts)*10000 + month(ts)*100 + day(ts) AS INTEGER) AS day,
           CAST(hour(ts)*10000 + minute(ts)*100 + second(ts) AS INTEGER) AS time,
           CAST(100.0 AS DOUBLE) + value AS close
    FROM events
),
pfx AS (
    SELECT *, list(close) OVER (
        PARTITION BY user_id ORDER BY day, time, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _c
    FROM base
)
SELECT user_id, event_id, day, time, close,
       {X.ema_fold_sql('_c', 9)} AS ema_fast,
       {X.ema_fold_sql('_c', 21)} AS ema_slow
FROM pfx""",
)


# ---------------------------------------------------------------------------
# The reference's slope-tolerance quirk, reproduced bit-for-bit
# (Features/MovingAverages/MovingAverages.cs:30 passes
# config.LookbackPeriodSlow = 14 — StrategyAnalyzerExporter.cs:125 —
# as tolerance; SURVEY.md §2.3 quirk note): |first| < 14 zeroes the slope.

_QUIRK_CFG = FeatureConfig(
    time_start=TESTDATA_CONFIG.time_start,
    time_end=TESTDATA_CONFIG.time_end,
    strict_reference_tolerance=True,
)


def _q_quirk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strategy_analyzer_exporter_spark.operators.features import features_df

    return features_df(spark, sf_dir, _QUIRK_CFG)


register("features_strict_reference_quirk", _q_quirk, features_sql(_QUIRK_CFG))


# ---------------------------------------------------------------------------
# P4 — strategy-level global warm-up gate (CurrentBars ≥ N over the whole
# series, StrategyAnalyzerExporter.cs:86,186). NOT a global row_number
# (single-partition window — the scale shape banned by
# tests/test_plans.py): bars are unique per (day, time) by construction
# (bars_df groups on exactly that key), so "skip the first 20 bars" is
# "(day, time) strictly above the 20th bar's key" — a TakeOrdered(20)
# reduced to a 1-row threshold, broadcast into a map-only filter.


def _q_warmup_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars_df(spark, sf_dir)
    th = (
        b.orderBy("day", "time")
        .limit(20)
        .groupBy()
        .agg(F.max(F.struct("day", "time")).alias("_th"))
    )
    return (
        b.join(F.broadcast(th))
        .filter(F.struct("day", "time") > F.col("_th"))
        .select("day", "time", "close")
    )


register(
    "feature_warmup_global",
    _q_warmup_global,
    f"""WITH {BARS_CTE},
g AS (SELECT day, time, close, row_number() OVER (ORDER BY day, time) AS _g FROM bars)
SELECT day, time, close FROM g WHERE _g > 20""",
)


# ---------------------------------------------------------------------------
# Sessionization (gap > 30 min starts a new session) — the lag+cumsum
# pattern; one window partitioning on user_id.


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Integer-microsecond gap: Spark 4 forbids TIMESTAMP_NTZ → BIGINT
    # casts, and whole-SECOND diffs truncate while DuckDB's epoch() is
    # fractional — a gap of 1800.9s would split the engines at the
    # boundary. timestamp_diff(MICROSECOND) vs epoch_us() are both exact
    # integers and tz-free on wall-clock timestamps.
    gap_us = F.timestamp_diff("MICROSECOND", F.lag("ts").over(w), F.col("ts"))
    marked = ev.withColumn(
        "_new",
        F.when(gap_us.isNull() | (gap_us > 1800 * 1_000_000), 1).otherwise(0),
    )
    sess_id = F.sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = marked.withColumn("session_id", sess_id.cast("long"))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        X.dsum("value").alias("session_value"),
    )


register(
    "sessionization",
    _q_sessionize,
    f"""WITH marked AS (
    SELECT *, CASE WHEN lagged IS NULL OR gap_us > 1800 * 1000000
              THEN 1 ELSE 0 END AS _new
    FROM (
        SELECT user_id, event_id, ts, value,
               lag(ts) OVER w AS lagged,
               epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
),
sess AS (
    SELECT *, CAST(sum(_new) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM marked
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       {X.dsum_sql('value')} AS session_value
FROM sess GROUP BY user_id, session_id""",
)


# ---------------------------------------------------------------------------
# Exact distribution stats: stddev/variance from decimal sums (engine
# stddev aggregates have engine-specific summation order, so compute
# from exact sums + one double op sequence).


def _q_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(38,10)"
    s = F.sum(F.col("l_quantity").cast(dec)).cast("string").cast("double")
    ss = F.sum((F.col("l_quantity") * F.col("l_quantity")).cast(dec)).cast(
        "string"
    ).cast("double")
    n = F.count(F.lit(1)).cast("double")
    grouped = li.groupBy("l_returnflag").agg(
        s.alias("_s"), ss.alias("_ss"), n.alias("_n")
    )
    mean = F.col("_s") / F.col("_n")
    var = (F.col("_ss") - F.col("_s") * F.col("_s") / F.col("_n")) / (
        F.col("_n") - F.lit(1.0)
    )
    return grouped.select(
        "l_returnflag",
        F.col("_n").cast("long").alias("n"),
        mean.alias("mean_qty"),
        var.alias("var_qty"),
        F.sqrt(var).alias("stddev_qty"),
    )


register(
    "agg_exact_stats",
    _q_stats,
    """WITH g AS (
    SELECT l_returnflag,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS _s,
           CAST(CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) AS _ss,
           CAST(count(*) AS DOUBLE) AS _n
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(_n AS BIGINT) AS n,
       _s / _n AS mean_qty,
       (_ss - _s * _s / _n) / (_n - 1.0) AS var_qty,
       sqrt((_ss - _s * _s / _n) / (_n - 1.0)) AS stddev_qty
FROM g""",
)


# ---------------------------------------------------------------------------
# Unpivot (stack): wide → long on part price/size.


def _q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr(
            "stack(2, 'retailprice', p_retailprice, 'size', CAST(p_size AS DOUBLE))"
        ).alias("measure", "val"),
    )


register(
    "unpivot_stack",
    _q_unpivot,
    """SELECT p_partkey, 'retailprice' AS measure, p_retailprice AS val FROM part
UNION ALL
SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS val FROM part""",
)


# ---------------------------------------------------------------------------
# Funnel analysis: view → click → purchase, strictly ordered in event
# time per user. The scalable funnel shape is k chained (filter →
# per-user min) aggregations, each gated on the previous stage's
# timestamp via a plain user_id equi-join: every stage relation is one
# row per user, so it GROWS WITH |users| and must NOT carry an explicit
# broadcast hint (a hint overrides Spark's size threshold → executor
# OOM at the 100 TB design point). The stage aggregates are already
# hash-partitioned by their groupBy("user_id"), so the gate joins
# reuse that exchange; AQE still broadcasts when a stage is genuinely
# small. k passes over the events scan; at 100 TB this beats any
# collect-per-user-sort approach by never materializing per-user event
# lists.
#
# Missing stages surface as a HIGH-DATE SENTINEL, not NULL: the
# cross-engine harness can never compare NULL timestamps equal (pandas
# object-vs-NaT pitfall), and 2260-12-31 stays inside datetime64[ns]
# range.

_FUNNEL_SENTINEL = "2260-12-31 23:59:59"


def _q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ts IS NOT NULL keeps the one-pass twin equivalent by construction
    # (ADVICE r05): without it, a user whose only views carry NULL ts
    # would appear here with t_view NULL but be dropped by the twin's
    # _tv.isNotNull() gate. Current corpora have no NULL ts; the filter
    # makes the shared oracle's semantics explicit, not conditional.
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "event_type", "ts")
    )
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    sent = F.lit(_FUNNEL_SENTINEL).cast("timestamp")
    out = (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            F.coalesce("t_click", sent).alias("t_click"),
            F.coalesce("t_purchase", sent).alias("t_purchase"),
            (
                F.lit(1)
                + F.when(F.col("t_click").isNotNull(), 1).otherwise(0)
                + F.when(F.col("t_purchase").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("stage"),
        )
    )
    return out


_FUNNEL_ORACLE = f"""WITH t1 AS (
    SELECT user_id, min(ts) AS t_view FROM events
    WHERE event_type = 'view' AND ts IS NOT NULL GROUP BY user_id
),
t2 AS (
    SELECT e.user_id, min(e.ts) AS t_click
    FROM events e JOIN t1 ON e.user_id = t1.user_id
    WHERE e.event_type = 'click' AND e.ts > t1.t_view
    GROUP BY e.user_id
),
t3 AS (
    SELECT e.user_id, min(e.ts) AS t_purchase
    FROM events e JOIN t2 ON e.user_id = t2.user_id
    WHERE e.event_type = 'purchase' AND e.ts > t2.t_click
    GROUP BY e.user_id
)
SELECT t1.user_id, t1.t_view,
       coalesce(t2.t_click, TIMESTAMP '{_FUNNEL_SENTINEL}') AS t_click,
       coalesce(t3.t_purchase, TIMESTAMP '{_FUNNEL_SENTINEL}') AS t_purchase,
       CAST(1 + (t2.user_id IS NOT NULL)::INT + (t3.user_id IS NOT NULL)::INT
            AS BIGINT) AS stage
FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
LEFT JOIN t3 ON t1.user_id = t3.user_id"""


register("events_funnel_3step", _q_funnel, _FUNNEL_ORACLE)


# One-pass funnel twin: the relational shape above scans events k times
# (once per stage) and shuffles 5× — correct, but at 100 TB the event
# log is the dominant cost and k scans of it hurt. This variant scans
# events ONCE and shuffles ONCE, entirely JVM-side:
#
#   - a RANGE (UNBOUNDED PRECEDING, 1 PRECEDING) window on event-time
#     micros gives every event the min STRICTLY-EARLIER view ts, so a
#     click "qualifies" (ts > the user's first view) iff that running
#     min is non-null — the strict bound handles ts ties exactly like
#     the relational `ts > t_view`;
#   - the same frame over qualifying-click ts qualifies purchases
#     (ts > min qualifying click ⟺ some qualifying click is strictly
#     earlier);
#   - one groupBy(user_id) then takes the three mins. The window
#     already hash-partitioned by user_id, so the aggregate reuses the
#     exchange — ONE shuffle total (plan-asserted).
#
# A grouped-map (applyInPandas) variant was measured and REJECTED: it
# also achieves 1 scan / 1 shuffle, but the entire event log crosses
# Arrow into Python — 7.3 s vs 1.9 s for the 3-scan relational shape at
# 10× sf0.01. The Arrow boundary costs more than two extra codegen'd
# JVM scans; this window form keeps the single-pass plan without it.
# Same oracle as events_funnel_3step — results identical.


def _q_funnel_one_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ts may surface as TIMESTAMP or TIMESTAMP_NTZ depending on how the
    # nanos parquet was read; the session timezone is pinned UTC, so the
    # cast is value-identity either way
    tsm = F.unix_micros(F.col("ts").cast("timestamp"))
    # same ts IS NOT NULL guard as the relational twin (shared oracle)
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "event_type", tsm.alias("_tsm"))
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("_tsm")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    is_view = F.col("event_type") == "view"
    prior_view = F.min(F.when(is_view, F.col("_tsm"))).over(w_prev)
    qual_click = F.when(
        (F.col("event_type") == "click") & prior_view.isNotNull(), F.col("_tsm")
    )
    staged = ev.select(
        "user_id",
        "_tsm",
        is_view.alias("_is_view"),
        (F.col("event_type") == "purchase").alias("_is_buy"),
        qual_click.alias("_qc"),
        F.min(qual_click).over(w_prev).alias("_prior_qc"),
    )
    qual_buy = F.when(
        F.col("_is_buy") & F.col("_prior_qc").isNotNull(), F.col("_tsm")
    )
    agg = staged.groupBy("user_id").agg(
        F.min(F.when(F.col("_is_view"), F.col("_tsm"))).alias("_tv"),
        F.min("_qc").alias("_tc"),
        F.min(qual_buy).alias("_tp"),
    )
    sent = F.lit(_FUNNEL_SENTINEL).cast("timestamp")
    return agg.filter(F.col("_tv").isNotNull()).select(
        "user_id",
        F.timestamp_micros(F.col("_tv")).alias("t_view"),
        F.coalesce(F.timestamp_micros(F.col("_tc")), sent).alias("t_click"),
        F.coalesce(F.timestamp_micros(F.col("_tp")), sent).alias("t_purchase"),
        (
            F.lit(1)
            + F.when(F.col("_tc").isNotNull(), 1).otherwise(0)
            + F.when(F.col("_tp").isNotNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("stage"),
    )


register("events_funnel_one_pass", _q_funnel_one_pass, _FUNNEL_ORACLE)


# ---------------------------------------------------------------------------
# Retention cohorts: users grouped by first-seen week; for each
# (cohort_week, week_offset) the count of cohort users active that
# week. Two hash aggregations (first-seen per user, then the cohort
# matrix) joined on user_id — the per-user cohort relation grows with
# |users|, so no broadcast hint (AQE decides); the standard scalable
# retention shape; nothing materializes per-user activity lists. Week truncation is Monday-start in both engines;
# the offset division is exact (day difference is a multiple of 7).


def _q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ts IS NOT NULL: keeps the one-pass twin equivalent by
    # construction (ADVICE r05 — a NULL week would cohort differently
    # across the two shapes); no-op on the NULL-free corpora.
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", F.date_trunc("week", F.col("ts")).alias("week"))
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff("week", "cohort_week") / F.lit(7.0))
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").cast("long").alias("n_active"))
    )


_RETENTION_ORACLE = """WITH ev AS (
    SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
    WHERE ts IS NOT NULL
),
first AS (
    SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, e.week) / 7 AS BIGINT)
           AS week_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
FROM ev e JOIN first f ON e.user_id = f.user_id
GROUP BY f.cohort_week, week_offset"""


register("events_retention_cohorts", _q_retention, _RETENTION_ORACLE)


# One-pass retention twin (same idea as events_funnel_one_pass): the
# relational shape above pays a (user, week) distinct, a per-user min
# aggregate, a join, and the final matrix aggregate. Here the
# (user, week) dedupe happens INSIDE the hash(user_id) window partition
# (the bars-derivation lag trick — keep a week's first row), the cohort
# week is the running min over the same window (same partition + order
# → one WindowExec, one exchange), and only the final
# (cohort_week, week_offset) matrix aggregate shuffles again: 1 scan,
# 2 exchanges, no join. Same oracle — results identical.


def _q_retention_one_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same ts IS NOT NULL guard as the relational twin (shared oracle)
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", F.date_trunc("week", F.col("ts")).alias("week"))
    )
    w_seq = Window.partitionBy("user_id").orderBy("week")
    dedup = (
        ev.withColumn("_prev", F.lag("week").over(w_seq))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col("week")))
        .drop("_prev")
    )
    w_run = w_seq.rowsBetween(Window.unboundedPreceding, 0)
    return (
        dedup.select(
            "user_id",
            "week",
            F.min("week").over(w_run).alias("cohort_week"),
        )
        .select(
            "user_id",
            "cohort_week",
            (F.datediff("week", "cohort_week") / F.lit(7.0))
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").cast("long").alias("n_active"))
    )


register("events_retention_one_pass", _q_retention_one_pass, _RETENTION_ORACLE)
