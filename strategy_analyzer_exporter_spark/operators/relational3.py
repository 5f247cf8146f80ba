"""Third wave: explicit grouping sets, bag-semantics set ops, array
scalar surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strategy_analyzer_exporter_spark import functions as X
from strategy_analyzer_exporter_spark.registry import register
from strategy_analyzer_exporter_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS (beyond rollup/cube): chosen set list.


def _q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        f"""SELECT l_returnflag, l_linestatus,
               {X.dsum_sql('l_quantity').replace('VARCHAR', 'STRING')} AS sum_qty,
               count(*) AS n_rows
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))"""
    )


register(
    "agg_grouping_sets",
    _q_grouping_sets,
    f"""SELECT l_returnflag, l_linestatus,
       {X.dsum_sql('l_quantity')} AS sum_qty, count(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))""",
)


# ---------------------------------------------------------------------------
# Bag-semantics set ops: INTERSECT ALL / EXCEPT ALL preserve
# multiplicities (min / difference of per-value counts).


def _q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    ia = c.intersectAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n")).withColumn("op", F.lit("intersect_all"))
    ea = c.exceptAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n")).withColumn("op", F.lit("except_all"))
    ua = c.unionAll(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n")).withColumn("op", F.lit("union_all"))
    return ia.unionByName(ea).unionByName(ua).select("op", "nationkey", "n")


register(
    "set_ops_all",
    _q_set_ops_all,
    """WITH c AS (SELECT c_nationkey AS nationkey FROM customer),
     s AS (SELECT s_nationkey AS nationkey FROM supplier)
SELECT 'intersect_all' AS op, nationkey, count(*) AS n
FROM (SELECT nationkey FROM c INTERSECT ALL SELECT nationkey FROM s) GROUP BY nationkey
UNION ALL
SELECT 'except_all' AS op, nationkey, count(*) AS n
FROM (SELECT nationkey FROM c EXCEPT ALL SELECT nationkey FROM s) GROUP BY nationkey
UNION ALL
SELECT 'union_all' AS op, nationkey, count(*) AS n
FROM (SELECT nationkey FROM c UNION ALL SELECT nationkey FROM s) GROUP BY nationkey""",
)


# ---------------------------------------------------------------------------
# Array scalar surface over tokenized text: sort/slice/contains/
# distinct/position/reverse — all codegen'd built-ins with DuckDB list
# twins.


def _q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = X.tokens(F.col("text"))
    arr = F.array_sort(F.array_distinct(toks))
    return d.select(
        "doc_id",
        F.size(arr).cast("long").alias("n_vocab"),
        F.array_join(F.slice(arr, 1, 5), ",").alias("first5_vocab"),
        F.array_contains(arr, "the").alias("has_the"),
        F.array_position(arr, "data").cast("long").alias("pos_data"),
        F.element_at(F.reverse(arr), 1).alias("last_vocab"),
    )


register(
    "scalar_array_funcs",
    _q_array_funcs,
    f"""WITH t AS (
    SELECT doc_id, list_sort(list_distinct({X.TOKENS_SQL})) AS arr FROM documents
)
SELECT doc_id,
       CAST(len(arr) AS BIGINT) AS n_vocab,
       array_to_string(arr[1:5], ',') AS first5_vocab,
       list_contains(arr, 'the') AS has_the,
       CAST(coalesce(list_position(arr, 'data'), 0) AS BIGINT) AS pos_data,
       arr[-1] AS last_vocab
FROM t""",
)
