"""Bit-equality between the two vector-kernel paths (arrow vs fold).

The arrow path must be a drop-in replacement for the pinned Catalyst
fold: same values to the last ulp, for cosine, squared-L2, and the LSH
bucket signature. Column-wise numpy left-fold == element left-fold is
an exact identity (same op sequence per row), so any mismatch here is
a kernel bug, not float noise.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from strategy_analyzer_exporter_spark.functions import vector

SF = "/root/testdata/sf0.001"


def _emb_pairs(spark):
    from strategy_analyzer_exporter_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    # 20 x N pairs — enough to exercise batching without an O(n^2) blowup
    return a.filter(F.col("ia") < 20).crossJoin(b)


def test_cosine_bit_equal(spark):
    pairs = _emb_pairs(spark)
    df = pairs.select(
        "ia",
        "ib",
        vector.fold_cosine(F.col("va"), F.col("vb")).alias("fold"),
        vector._arrow_cosine()(F.col("va"), F.col("vb")).alias("arrow"),
    ).toPandas()
    assert len(df) > 0
    for f, a in zip(df["fold"], df["arrow"]):
        assert (math.isnan(f) and math.isnan(a)) or f == a, (f, a, f - a)


def test_sqdist_bit_equal(spark):
    pairs = _emb_pairs(spark).select(
        "ia",
        "ib",
        F.col("va").cast("array<double>").alias("va"),
        F.col("vb").cast("array<double>").alias("vb"),
    )
    df = pairs.select(
        vector.fold_sqdist(F.col("va"), F.col("vb")).alias("fold"),
        vector._arrow_sqdist()(F.col("va"), F.col("vb")).alias("arrow"),
    ).toPandas()
    assert len(df) > 0
    assert (df["fold"] == df["arrow"]).all()


def test_bucket_bit_equal(spark):
    from strategy_analyzer_exporter_spark.operators.similarity import _hyperplanes
    from strategy_analyzer_exporter_spark.sources.tables import load_table

    planes = _hyperplanes()
    emb = load_table(spark, SF, "embeddings")
    key = tuple(tuple(p) for p in planes)
    df = emb.select(
        vector._fold_bucket(F.col("embedding"), key).alias("fold"),
        vector._arrow_bucket(key)(F.col("embedding")).alias("arrow"),
    ).toPandas()
    assert len(df) > 0
    assert (df["fold"] == df["arrow"]).all()


def test_kernel_env_dispatch(monkeypatch):
    monkeypatch.setenv(vector.KERNEL_ENV, "fold")
    assert vector.kernel() == "fold"
    monkeypatch.setenv(vector.KERNEL_ENV, "arrow")
    assert vector.kernel() == "arrow"
    monkeypatch.setenv(vector.KERNEL_ENV, "bogus")
    assert vector.kernel() == "arrow"
    monkeypatch.delenv(vector.KERNEL_ENV)
    assert vector.kernel() == "arrow"
