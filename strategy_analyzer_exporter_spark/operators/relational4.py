"""Fourth wave: full-outer join, RANGE window frames with value window
functions, and null-handling scalar surface.

Reference has no joins/window-library at all (SURVEY.md §2.6 gap map);
these generalize the planned surface per BASELINE.json north_star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from strategy_analyzer_exporter_spark.registry import register
from strategy_analyzer_exporter_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Full outer join. Sides are pre-aggregated and deliberately asymmetric
# (BUILDING-segment customers vs negative-balance suppliers) so both
# null-extension directions actually occur in the corpus. Both inputs
# aggregate before joining — at scale this is two map-side-combined
# shuffles on a tiny key domain, then a broadcast-able full join.


def _q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy(F.col("c_nationkey").alias("nk_c"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.nk_c == s.nk_s, "full_outer").select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        F.col("nk_c").isNull().alias("only_supp"),
        F.col("nk_s").isNull().alias("only_cust"),
    )


register(
    "join_full_outer",
    _q_join_full_outer,
    """WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust
           FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY 1),
     s AS (SELECT s_nationkey AS nk, count(*) AS n_supp
           FROM supplier WHERE s_acctbal < 0 GROUP BY 1)
SELECT coalesce(c.nk, s.nk) AS nationkey,
       coalesce(n_cust, 0) AS n_cust,
       coalesce(n_supp, 0) AS n_supp,
       c.nk IS NULL AS only_supp,
       s.nk IS NULL AS only_cust
FROM c FULL OUTER JOIN s ON c.nk = s.nk""",
)


# ---------------------------------------------------------------------------
# RANGE window frame (value-distance, peer-inclusive — distinct from the
# ROWS frames used everywhere else) + first/last/nth value functions.
# Trailing-30-day spend per customer: order by integer day number so the
# frame bound is engine-portable; sums are decimal-staged so the window
# fold order can't perturb the double (README "Correctness model").


def _q_window_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").withColumn(
        "day_n", F.datediff("o_orderdate", F.lit("1992-01-01")).cast("int")
    )
    w_range = (
        Window.partitionBy("o_custkey").orderBy("day_n").rangeBetween(-30, 0)
    )
    w_rows = Window.partitionBy("o_custkey").orderBy("day_n", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "day_n",
        F.sum(F.col("o_totalprice").cast("decimal(38,10)"))
        .over(w_range)
        .cast("string")
        .cast("double")
        .alias("spend_30d"),
        F.count(F.lit(1)).over(w_range).cast("long").alias("n_orders_30d"),
        F.first("o_totalprice")
        .over(w_rows.rowsBetween(Window.unboundedPreceding, 0))
        .alias("first_price"),
        F.nth_value("o_totalprice", 2)
        .over(w_rows.rowsBetween(Window.unboundedPreceding, 0))
        .alias("second_price"),
        F.last("o_totalprice")
        .over(w_rows.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("final_price"),
    )


register(
    "window_frame_range",
    _q_window_frame_range,
    """WITH t AS (
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS INTEGER) AS day_n
    FROM orders)
SELECT o_orderkey, o_custkey, day_n,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,10))) OVER (
            PARTITION BY o_custkey ORDER BY day_n
            RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS spend_30d,
       count(*) OVER (PARTITION BY o_custkey ORDER BY day_n
            RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_orders_30d,
       first_value(o_totalprice) OVER w AS first_price,
       nth_value(o_totalprice, 2) OVER w AS second_price,
       last_value(o_totalprice) OVER (PARTITION BY o_custkey
            ORDER BY day_n, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS final_price
FROM t
WINDOW w AS (PARTITION BY o_custkey ORDER BY day_n, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
)


# ---------------------------------------------------------------------------
# Null-handling scalars: NULL introduction (nullif), recovery (coalesce /
# ifnull), predicates (IS NULL), and null-aware conditionals — all
# codegen'd built-ins with exact DuckDB twins.


def _q_scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    status_n = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        status_n.alias("status_n"),
        F.coalesce(status_n, F.lit("OPEN")).alias("status_back"),
        F.ifnull(
            F.nullif(F.col("o_orderpriority"), F.col("o_orderpriority")), F.lit("-")
        ).alias("always_dash"),
        status_n.isNull().alias("is_open"),
        F.when(status_n.isNull(), F.lit("open"))
        .otherwise(F.lit("closed"))
        .alias("bucket"),
    )


register(
    "scalar_null_handling",
    _q_scalar_null_handling,
    """SELECT o_orderkey,
       nullif(o_orderstatus, 'O') AS status_n,
       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_back,
       ifnull(nullif(o_orderpriority, o_orderpriority), '-') AS always_dash,
       nullif(o_orderstatus, 'O') IS NULL AS is_open,
       CASE WHEN nullif(o_orderstatus, 'O') IS NULL THEN 'open' ELSE 'closed' END AS bucket
FROM orders""",
)
