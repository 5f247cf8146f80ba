"""End-to-end feature-pipeline semantics (SURVEY.md §2.3, FIXTURES.md §4):
warm-up boundaries, day reset, EMA impl equivalence, export discipline."""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

import py_oracle as O
from strategy_analyzer_exporter_spark.operators.features import (
    FeatureConfig,
    TESTDATA_CONFIG,
    features_df,
    with_ema,
    with_ema_fold,
)
from strategy_analyzer_exporter_spark.sources.bars import bars_df

SF = "/root/testdata/sf0.001"


def _mini_bars(spark, days):
    """days: {day_int: n_rows}; close follows a deterministic walk."""
    rows = []
    for day, n in days.items():
        for i in range(n):
            close = 100.0 + (i * 7 % 13) - (i % 3)
            rows.append(
                (day, 93000 + i * 100, i, 0, close - 0.5, close + 1.0, close - 1.0, close, 10.0)
            )
    return spark.createDataFrame(
        rows,
        "day: int, time: int, event_id: long, user_id: long, open: double, "
        "high: double, low: double, close: double, volume: double",
    )


def test_ema_pandas_equals_fold_bit_for_bit(spark):
    """The O(n) applyInPandas EMA and the pure-expression prefix-fold EMA
    must agree exactly — same float ops in the same order."""
    bars = _mini_bars(spark, {20240101: 40, 20240102: 25, 20240103: 19})
    a = with_ema(bars).orderBy("day", "time").collect()
    b = with_ema_fold(bars).orderBy("day", "time").collect()
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        assert ra["moving_average"] == rb["moving_average"]
        assert ra["slow_moving_average"] == rb["slow_moving_average"]


def test_ema_matches_python_oracle(spark):
    bars = _mini_bars(spark, {20240101: 30})
    got = with_ema(bars).orderBy("time").collect()
    closes = [r["close"] for r in got]
    assert [r["moving_average"] for r in got] == O.ema(closes, 9)
    assert [r["slow_moving_average"] for r in got] == O.ema(closes, 21)


def test_warmup_gate_emits_from_20th_row(spark):
    """P5: a 25-row day emits rows 20..25 (6 rows); a 19-row day emits
    nothing (FeaturesBarService.cs:44); frame is 20 rows on the first
    emitted row, 21 afterwards."""
    cfg = FeatureConfig(time_start=0, time_end=235959)
    spark.createDataFrame([], "x: int")  # noqa - keep session warm
    bars = _mini_bars(spark, {20240101: 25, 20240102: 19})

    from strategy_analyzer_exporter_spark.operators import features as FT

    sess = bars
    ma = FT.with_ema(sess, cfg)
    from pyspark.sql import Window

    w_day = Window.partitionBy("day").orderBy("time")
    out = (
        ma.withColumn("rn", F.row_number().over(w_day))
        .filter(F.col("rn") >= cfg.bars_required)
        .groupBy("day")
        .count()
        .collect()
    )
    counts = {r["day"]: r["count"] for r in out}
    assert counts.get(20240101) == 6
    assert 20240102 not in counts


def test_flagship_schema_discipline(spark):
    df = features_df(spark, SF, TESTDATA_CONFIG)
    assert df.columns == sorted(df.columns)  # alphabetical (ordinal) order
    assert df.columns == [
        "close", "day", "f_close_location_value",
        "f_moving_average_autocorrelation", "f_moving_average_distance",
        "f_moving_average_slope", "f_moving_average_slow_autocorrelation",
        "f_moving_average_slow_distance", "f_open_location_value",
        "high", "low", "open", "time", "volume",
    ]
    types = dict(df.dtypes)
    assert types["day"] == "int" and types["time"] == "int"
    assert all(t == "float" for c, t in types.items() if c not in ("day", "time"))
    rows = df.count()
    assert rows > 0


def test_day_partition_isolation(spark):
    """W8: feature values for a day are unaffected by other days'
    presence (buffers reset at day boundary)."""
    one = _mini_bars(spark, {20240105: 30})
    two = _mini_bars(spark, {20240104: 27, 20240105: 30})
    cfg = FeatureConfig(time_start=0, time_end=235959)

    def run(bars):
        from pyspark.sql import Window

        ma = with_ema(bars, cfg)
        w = Window.partitionBy("day").orderBy("time").rowsBetween(-(cfg.window - 1), 0)
        from strategy_analyzer_exporter_spark import functions as X

        return {
            (r["day"], r["time"]): r["v"]
            for r in ma.select(
                "day", "time", X.autocorr(F.collect_list("moving_average").over(w)).alias("v")
            ).collect()
            if r["day"] == 20240105
        }

    assert run(one) == run(two)


def test_bars_derivation_deterministic(spark):
    a = bars_df(spark, SF).orderBy("day", "time").collect()
    b = bars_df(spark, SF).orderBy("day", "time").collect()
    assert a == b
    for r in a[:100]:
        assert r["high"] >= max(r["open"], r["close"])
        assert r["low"] <= min(r["open"], r["close"])


def test_fused_pipeline_byte_equal_to_windowed(spark):
    """features_df_fused (one applyInPandas pass, incremental
    exact-integer window sums) must reproduce the windowed+decimal
    pipeline to the byte — same floats, same float32 narrowing."""
    from strategy_analyzer_exporter_spark.operators.features import (
        TESTDATA_CONFIG,
        features_df,
        features_df_fused,
    )

    a = (
        features_df(spark, SF, TESTDATA_CONFIG)
        .toPandas()
        .sort_values(["day", "time"])
        .reset_index(drop=True)
    )
    b = (
        features_df_fused(spark, SF, TESTDATA_CONFIG)
        .toPandas()
        .sort_values(["day", "time"])
        .reset_index(drop=True)
    )
    assert list(a.columns) == list(b.columns)
    assert a.equals(b)


def test_fused_pipeline_single_exchange(spark):
    from strategy_analyzer_exporter_spark import plans as P
    from strategy_analyzer_exporter_spark.operators.features import (
        TESTDATA_CONFIG,
        features_df_fused,
    )

    df = features_df_fused(spark, SF, TESTDATA_CONFIG)
    assert P.count_exchanges(df) <= 1, P.physical_plan(df)


def test_q12_integer_matches_decimal_reference():
    """q12's integer HALF_UP rounding must be bit-identical to the
    Decimal reference over the representable domain."""
    import random

    from strategy_analyzer_exporter_spark.functions.exact import q12, q12_decimal

    rnd = random.Random(20260813)
    cases = [0.0, -0.0, 1e-13, -1e-13, 5e-13, -5e-13, 1.5e-12, 2.5e-12,
             -2.5e-12, -1.5e-12, 0.1, 0.3, 1 / 3, 4000.123456789012]
    for _ in range(20000):
        cases.append(rnd.uniform(-1, 1) * (10 ** rnd.uniform(-15, 15)))
    for x in cases:
        assert q12(x) == q12_decimal(x), repr(x)


def test_autocorr_from_sums_bit_equals_windowed():
    """The streaming updater's sliding exact-integer accumulators must
    reproduce autocorr_windowed's full re-sum bit-for-bit on arbitrary
    series and window caps — integer add/subtract is order-independent,
    so the sliding sums equal the scratch sums exactly, and everything
    after the d12 conversions is the same pinned float sequence. This
    is the direct check the r05 O(1)-per-bar rewrite rests on (seeded
    deterministic fuzz over magnitudes 1e-3..1e6, caps 2..8)."""
    import random

    from strategy_analyzer_exporter_spark.functions.exact import (
        autocorr_from_sums,
        autocorr_windowed,
        q12,
    )

    rnd = random.Random(20260814)
    for trial in range(300):
        cap = rnd.randint(2, 8)
        n = rnd.randint(0, 40)
        xs = [rnd.uniform(1e-3, 1.0) * (10 ** rnd.uniform(0, 6)) for _ in range(n)]
        win: list[float] = []
        qv: list[int] = []
        qvv: list[int] = []
        qp: list[int] = []
        s = ss = p = 0
        for x in xs:
            prev = win[-1] if win else None
            win.append(x)
            q = q12(x)
            qv.append(q)
            s += q
            q = q12(x * x)
            qvv.append(q)
            ss += q
            if prev is not None:
                q = q12(x * prev)
                qp.append(q)
                p += q
            if len(win) > cap:
                win.pop(0)
                s -= qv.pop(0)
                ss -= qvv.pop(0)
                p -= qp.pop(0)
            pp = [win[i] * win[i - 1] for i in range(1, len(win))]
            a = autocorr_windowed(win, pp)
            b = autocorr_from_sums(len(win), win[0], win[-1], s, ss, p)
            assert a == b, (trial, x, win, a, b)


def test_running_stats_byte_equal_to_frame_stats(spark):
    """r15: the O(1)-per-row running-sum/lag window stats
    (stats_impl="running", the registered default) must reproduce the
    bounded-frame shape to the byte at BOTH gate scales — the decimal
    sliding sums are exact integers, so difference-of-running-sums is
    the identical value, and everything downstream is the same pinned
    float64 sequence. Also guards the decimal(30,12) re-cast: a naked
    (38,12)−(38,12) difference goes through Spark's precision-loss
    path (scale 12 → 11) and rounds the quantized grid (measured: 1
    row at sf0.01 before the fix)."""
    from strategy_analyzer_exporter_spark.operators.features import (
        TESTDATA_CONFIG,
        features_df,
    )

    for sf in ("0.001", "0.01"):
        d = f"/root/testdata/sf{sf}"
        a = (
            features_df(spark, d, TESTDATA_CONFIG, stats_impl="running")
            .toPandas()
            .sort_values(["day", "time"])
            .reset_index(drop=True)
        )
        b = (
            features_df(spark, d, TESTDATA_CONFIG, stats_impl="frame")
            .toPandas()
            .sort_values(["day", "time"])
            .reset_index(drop=True)
        )
        assert list(a.columns) == list(b.columns)
        assert a.equals(b), sf
