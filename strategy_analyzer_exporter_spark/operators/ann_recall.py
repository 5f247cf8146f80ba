"""ANN quality measurement: recall of the approximate indexes against
exact brute-force ground truth (VERDICT r03 next #6).

An ANN index you can't measure recall on is unshippable. This query
computes, per query vector and per method (PQ/ADC and LSH-bucketed),
how many of the method's returned neighbors appear in the exact top-5
— in BOTH engines from their own full pipelines, so the driver's
hash-compare certifies that the Spark index and the oracle index make
the *same approximation errors*, not merely similar ones.

Scale shape: the three inputs are the already-registered ANN queries
(each scale-audited on its own); their outputs are k rows per query —
the joins and aggregations here are over ≤ 10×5-row relations and the
ground-truth side broadcasts.

Registration is DEFERRED (registry.register_deferred): the oracle SQL
embeds the brute-force / LSH / PQ oracles verbatim as derived tables,
and composing them at plain import time would require module-level
sibling imports — the partially-initialized-entry-import crash class
documented in tests/test_pipeline_ops.py. The deferral names its
dependencies and fires as soon as the last of them registers, whatever
module happens to be the entry import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strategy_analyzer_exporter_spark.registry import (
    ORACLES,
    QUERIES,
    register,
    register_deferred,
)


def _recall_stats(approx: DataFrame, truth: DataFrame, method: str) -> DataFrame:
    """Per-query hit counts of ``approx`` (query_id, cand_id, ...)
    against ``truth``. The division is small-int / small-int — exact in
    double in both engines."""
    j = approx.select("query_id", "cand_id").join(
        F.broadcast(truth.withColumn("_hit", F.lit(1))),
        ["query_id", "cand_id"],
        "left",
    )
    return (
        j.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_approx"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_hits"),
        )
        .select(F.lit(method).alias("method"), "query_id", "n_approx", "n_hits")
    )


def _q_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    truth = QUERIES["similarity_bruteforce_topk"](spark, sf_dir).select(
        "query_id", "cand_id"
    )
    pq = _recall_stats(QUERIES["similarity_pq_adc"](spark, sf_dir), truth, "pq_adc")
    lsh = _recall_stats(QUERIES["similarity_lsh_ann"](spark, sf_dir), truth, "lsh_ann")
    return (
        pq.unionByName(lsh)
        .withColumn(
            "recall", F.col("n_hits").cast("double") / F.col("n_approx").cast("double")
        )
        .select("method", "query_id", "n_approx", "n_hits", "recall")
    )


def _register() -> None:
    truth = ORACLES["similarity_bruteforce_topk"]
    pq = ORACLES["similarity_pq_adc"]
    lsh = ORACLES["similarity_lsh_ann"]
    oracle = f"""WITH truth AS (
    SELECT query_id, cand_id FROM ({truth}) t
),
pq AS (SELECT query_id, cand_id FROM ({pq}) t),
lsh AS (SELECT query_id, cand_id FROM ({lsh}) t),
stats AS (
    SELECT 'pq_adc' AS method, a.query_id,
           CAST(count(*) AS BIGINT) AS n_approx,
           CAST(sum(CASE WHEN t.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hits
    FROM pq a LEFT JOIN truth t USING (query_id, cand_id)
    GROUP BY a.query_id
    UNION ALL
    SELECT 'lsh_ann' AS method, a.query_id,
           CAST(count(*) AS BIGINT) AS n_approx,
           CAST(sum(CASE WHEN t.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hits
    FROM lsh a LEFT JOIN truth t USING (query_id, cand_id)
    GROUP BY a.query_id
)
SELECT method, query_id, n_approx, n_hits,
       CAST(n_hits AS DOUBLE) / CAST(n_approx AS DOUBLE) AS recall
FROM stats"""
    register("similarity_pq_recall", _q_pq_recall, oracle)


register_deferred(
    _register,
    requires=(
        "similarity_bruteforce_topk",
        "similarity_pq_adc",
        "similarity_lsh_ann",
    ),
)
