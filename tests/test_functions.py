"""Windowed-feature expression helpers vs the pure-Python oracle,
covering the edge-case micro-fixtures of FIXTURES.md §4."""

import math

import pytest
from pyspark.sql import functions as F

import py_oracle as O
from strategy_analyzer_exporter_spark import functions as X

CASES = [
    [5.0],                                   # single element: autocorr 0 (n<=lag), slope 0 (n<2)
    [3.0, 3.0, 3.0, 3.0],                    # constant: autocorr den<tol -> 0
    [1e-9, 2.0, 3.0],                        # near-zero first: slope 0
    [100.0, 101.5, 99.75, 102.25, 101.0],    # ordinary window
    [1.0, -1.0, 1.0, -1.0, 1.0, -1.0],       # alternating: strong negative autocorr
    [float(i) for i in range(1, 22)],        # full 21-row frame
]


def _arr_df(spark, xs):
    return spark.createDataFrame([(xs,)], "arr: array<double>")


@pytest.mark.parametrize("xs", CASES)
def test_autocorr_matches_python(spark, xs):
    got = _arr_df(spark, xs).select(X.autocorr(F.col("arr")).alias("v")).first()["v"]
    assert got == O.autocorr(xs)


@pytest.mark.parametrize("xs", CASES)
def test_slope_matches_python(spark, xs):
    got = _arr_df(spark, xs).select(X.slope(F.col("arr")).alias("v")).first()["v"]
    assert got == O.slope(xs)


@pytest.mark.parametrize("xs", CASES)
@pytest.mark.parametrize("span", [9, 21])
def test_ema_fold_matches_python(spark, xs, span):
    got = _arr_df(spark, xs).select(X.ema_fold(F.col("arr"), span).alias("v")).first()["v"]
    assert got == O.ema(xs, span)[-1]


@pytest.mark.parametrize(
    "close,ma,want_zero",
    [
        (100.0, 0.0, True),            # |ma| < tol
        (100.0, 5e-7, True),           # just under tol
        (float("nan"), 100.0, True),   # NaN guard
        (float("inf"), 100.0, True),   # Inf guard
        (100.0, 90.0, False),
    ],
)
def test_distance_guards(spark, close, ma, want_zero):
    df = spark.createDataFrame([(close, ma)], "close: double, ma: double")
    got = df.select(X.ma_distance("close", "ma").alias("v")).first()["v"]
    want = O.distance(close, ma)
    assert got == want
    assert (got == 0.0) == want_zero


@pytest.mark.parametrize(
    "anchor,high,low",
    [
        (10.0, 10.0, 10.0),   # zero range -> 0.0
        (10.0, 12.0, 9.0),
        (9.0, 12.0, 9.0),     # at low -> -1
        (12.0, 12.0, 9.0),    # at high -> +1
    ],
)
def test_location_value(spark, anchor, high, low):
    df = spark.createDataFrame([(anchor, high, low)], "a: double, h: double, l: double")
    got = df.select(X.location_value("a", "h", "l").alias("v")).first()["v"]
    assert got == O.location_value(anchor, high, low)


def test_autocorr_alternating_is_negative(spark):
    xs = [1.0, -1.0] * 10
    got = _arr_df(spark, xs).select(X.autocorr(F.col("arr")).alias("v")).first()["v"]
    assert got < -0.9


def test_autocorr_bounded(spark):
    for xs in CASES:
        v = _arr_df(spark, xs).select(X.autocorr(F.col("arr")).alias("v")).first()["v"]
        assert -1.0001 <= v <= 1.0001
