"""Partitioning-invariance: the property that makes results trustworthy
at cluster scale. A query whose answer changes when the input arrives
in different partition layouts is order-dependent — it would produce
different bytes on a 1000-executor cluster than on local[32], and
different bytes again after any retry/replay. Every op here is run
twice with adversarially different input partitionings and must produce
identical results (exact equality, floats included — the engine's
decimal-staging/fixed-point discipline is what's under test)."""

import pyspark.sql.functions as F

from strategy_analyzer_exporter_spark.operators.dedup import connected_components
from strategy_analyzer_exporter_spark.operators.graph import (
    PR_SCALE,
    pagerank_fixed_point,
)
from strategy_analyzer_exporter_spark.operators.pipeline import (
    KM_K,
    kmeans_assign,
    kmeans_update,
)
from strategy_analyzer_exporter_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _rows(df, *key):
    return sorted(tuple(r) for r in df.collect())


def test_pagerank_partition_invariant(spark):
    li = load_table(spark, SF, "lineitem").select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
    ).distinct()
    edges = li.unionAll(li.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    a = _rows(pagerank_fixed_point(edges, iters=2))
    # adversarial layout: everything in 1 partition vs scattered over 17
    b = _rows(pagerank_fixed_point(edges.coalesce(1), iters=2))
    c = _rows(pagerank_fixed_point(edges.repartition(17), iters=2))
    assert a == b == c
    total = sum(r[1] for r in a)
    assert total <= len(a) * PR_SCALE  # dropped dangling mass only shrinks


def test_connected_components_partition_invariant(spark):
    d = load_table(spark, SF, "documents").select("doc_id")
    # synthetic chain edges: i -> i+1 within blocks of 5 (worst case for
    # min-label propagation: diameter 4, forces multiple rounds)
    e = d.filter(F.col("doc_id") % 5 != 4).select(
        F.col("doc_id").alias("doc_a"), (F.col("doc_id") + 1).alias("doc_b")
    )
    a = _rows(connected_components(e))
    b = _rows(connected_components(e.coalesce(1)))
    c = _rows(connected_components(e.repartition(13)))
    assert a == b == c
    # every chain labels to its block head
    assert all(cid == (doc // 5) * 5 for doc, cid in a)


def test_kmeans_round_partition_invariant(spark):
    e = load_table(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    from pyspark.sql import Window

    w = Window.orderBy("vec_id")
    cents = (
        e.orderBy("vec_id")
        .limit(KM_K)
        .select(
            (F.row_number().over(w) - 1).cast("long").alias("cid"),
            F.col("v").alias("cv"),
        )
    )

    def one_round(emb):
        assigned = kmeans_assign(emb, cents).select("vec_id", "cid")
        cents2 = kmeans_update(assigned, emb)
        final = kmeans_assign(emb, cents2).select("vec_id", "cid")
        return _rows(final)

    a = one_round(e)
    b = one_round(e.coalesce(1))
    c = one_round(e.repartition(11))
    assert a == b == c


def test_dsum_queries_partition_invariant(spark):
    """The decimal-staged money aggregates must not depend on partial
    aggregation order: same values from 1 and 23 partitions."""
    from strategy_analyzer_exporter_spark.functions import dsum

    li = load_table(spark, SF, "lineitem")
    expr = dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    a = _rows(li.groupBy("l_returnflag").agg(expr))
    b = _rows(li.coalesce(1).groupBy("l_returnflag").agg(expr))
    c = _rows(li.repartition(23).groupBy("l_returnflag").agg(expr))
    assert a == b == c
