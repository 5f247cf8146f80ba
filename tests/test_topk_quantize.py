"""Semantic invariants for functions/topk.py and the int8 quantizer —
properties the DuckDB hash-compare can't articulate (it proves equality
with the oracle, not that both are RIGHT)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_take_ordered_ranked_equals_window_ranking(spark):
    """Under a TOTAL order, TakeOrdered + rank-over-k must yield exactly
    the rows (and ranks) of an unpartitioned ranking window — the
    scale-safe form is a pure plan change, not a semantics change."""
    from pyspark.sql import Window

    from strategy_analyzer_exporter_spark.functions.topk import (
        take_ordered_ranked,
    )

    df = spark.range(1000).select(
        F.col("id"),
        (F.hash(F.col("id").cast("string")) % 97).alias("v"),
    )
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {
        (r.id, r.v, r.rn)
        for r in take_ordered_ranked(df, order, 25).collect()
    }
    w = Window.orderBy(*order)
    want = {
        (r.id, r.v, r.rn)
        for r in df.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 25)
        .collect()
    }
    assert got == want and len(got) == 25


def test_int8_quantize_invariants(spark):
    """Every code is in [-127, 127]; dequantization error is bounded by
    half a step (|x − q·maxabs/127| ≤ maxabs/254 + ulp slack); zero
    vectors quantize to zeros; the max-|x| element saturates."""
    import math

    from strategy_analyzer_exporter_spark.registry import QUERIES
    from strategy_analyzer_exporter_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    out = {r.vec_id: r for r in QUERIES["embedding_quantize_int8"](spark, sf).collect()}
    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, sf, "embeddings").limit(50).collect()
    }
    assert out
    for vec_id, v in emb.items():
        r = out[vec_id]
        q = [int(x) for x in r.q_csv.split(",")]
        assert len(q) == len(v)
        maxabs = max(abs(x) for x in v)
        assert abs(r.maxabs - maxabs) <= 1e-12 * max(maxabs, 1.0)
        assert all(-127 <= c <= 127 for c in q)
        if maxabs == 0.0:
            assert all(c == 0 for c in q)
            continue
        step = maxabs / 127.0
        for x, c in zip(v, q):
            assert abs(x - c * step) <= step / 2 + 1e-9 * maxabs, (vec_id, x, c)
        # the largest-magnitude element saturates at ±127
        assert any(abs(c) == 127 for c in q)
        assert r.n_sat >= 1
        assert r.sum_q == sum(q)
        assert not math.isnan(r.maxabs)
