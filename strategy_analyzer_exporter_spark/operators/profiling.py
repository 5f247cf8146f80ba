"""Data-profiling + skew-mitigation operators.

Profiling is the first step of any large-scale training-data pipeline
(null/distinct/range audit before spending cluster-hours); the salted
join is the explicit-skew answer for when AQE's runtime skew split isn't
available (e.g. a deliberately partitioned write must survive one key
holding 30% of rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strategy_analyzer_exporter_spark import functions as X
from strategy_analyzer_exporter_spark.registry import register
from strategy_analyzer_exporter_spark.sources.tables import load_table

_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_totalprice")


def _q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass numeric column profile: one aggregation computes every
    per-column statistic (ONE scan, map-side partial agg), then the wide
    row unpivots to (col, stat…) rows — profiling N columns of a 100 TB
    table costs one pass regardless of N."""
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n_rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{c}__n_null"),
            F.countDistinct(c).alias(f"{c}__n_distinct"),
            F.min(F.col(c).cast("double")).alias(f"{c}__min_v"),
            F.max(F.col(c).cast("double")).alias(f"{c}__max_v"),
        ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n_rows, {c}__n_null, {c}__n_distinct, {c}__min_v, {c}__max_v"
        for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) "
            "AS (col, n_rows, n_null, n_distinct, min_v, max_v)"
        )
    )


_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col, count(*) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       count(DISTINCT {c}) AS n_distinct,
       min(CAST({c} AS DOUBLE)) AS min_v, max(CAST({c} AS DOUBLE)) AS max_v
FROM orders"""
    for c in _PROFILE_COLS
)

register("profile_table", _q_profile_table, _PROFILE_ORACLE)


# ---------------------------------------------------------------------------
# Salted fact-fact join: replicate one side across NUM_SALTS shards so a
# hot key's rows spread over NUM_SALTS tasks instead of one straggler.
# The salt assignment is an arbitrary row partition — results are
# salt-invariant, so the oracle is the plain join.

NUM_SALTS = 8


def _q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    salted = li.withColumn("_salt", (F.col("l_linenumber") % NUM_SALTS).cast("int"))
    o_rep = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.explode(F.sequence(F.lit(0), F.lit(NUM_SALTS - 1))).alias("_salt"),
    )
    return (
        salted.join(
            o_rep,
            (salted.l_orderkey == o_rep.o_orderkey)
            & (salted._salt == o_rep._salt),
        )
        .groupBy("o_orderpriority")
        .agg(
            X.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


register(
    "join_skew_salted",
    _q_join_skew_salted,
    f"""SELECT o_orderpriority,
       {X.dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       count(*) AS n_rows
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority""",
)
