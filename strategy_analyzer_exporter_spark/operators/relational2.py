"""Second wave of relational surface: correlated subqueries, exact
percentiles, regex tokenization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strategy_analyzer_exporter_spark.registry import register
from strategy_analyzer_exporter_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Correlated scalar subquery (TPC-H Q2 pattern): row = group minimum.
# DataFrame form: broadcast the per-group min relation and equi-join —
# Catalyst de-correlates the SQL form into exactly this shape. The hint
# is legitimate because the group key is p_brand, a BOUNDED enum (25
# distinct "Brand#MN" values at every TPC-H scale factor), so the min
# relation is ≤ 25 rows no matter how large part grows.


def _q_corr_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    mins = p.groupBy(F.col("p_brand").alias("b")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        p.join(
            F.broadcast(mins),
            (p.p_brand == mins.b) & (p.p_retailprice == mins.min_price),
        )
        .select("p_brand", "p_partkey", "p_retailprice")
    )


register(
    "subquery_correlated_min",
    _q_corr_min,
    """SELECT p_brand, p_partkey, p_retailprice FROM part p
WHERE p_retailprice = (
    SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
)""",
)


# ---------------------------------------------------------------------------
# Correlated EXISTS with a non-equi condition (TPC-H Q4 pattern).


def _q_exists_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cond = (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate)
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


register(
    "subquery_exists_range",
    _q_exists_range,
    """SELECT o_orderpriority, count(*) AS n_orders FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority""",
)


# ---------------------------------------------------------------------------
# Exact interpolated percentiles — Spark `percentile` and DuckDB
# `quantile_cont` both sort exactly and linearly interpolate, and the
# interpolation arithmetic agrees bit-for-bit (verified empirically).


def _q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("p50_price"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("p95_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


register(
    "agg_percentile_exact",
    _q_percentile,
    """SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50_price,
       quantile_cont(l_extendedprice, 0.95) AS p95_price,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag""",
)


# ---------------------------------------------------------------------------
# Regex token counting (whitespace + BPE-ish classes) — text-analysis
# surface; simple character classes behave identically in Java regex and
# RE2.


def _q_token_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), F.lit(0)))
        .cast("long")
        .alias("n_alpha_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), F.lit(0)))
        .cast("long")
        .alias("n_num_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0)))
        .cast("long")
        .alias("n_bpe_ish_tokens"),
    )


register(
    "text_token_regex",
    _q_token_regex,
    """SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha_tokens,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_num_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_ish_tokens
FROM documents""",
)
