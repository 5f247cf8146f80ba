"""Fifth relational wave: the classic TPC-H decision-support shapes not
yet in the registry — count-distribution (Q13), max-scalar join (Q15),
not-in grouped count-distinct (Q16), having-gated in-subquery (Q18),
and anti-join + scalar-average filter (Q22). The reference engine has
no relational surface at all (SURVEY.md §2.6); these queries exist to
prove the generalized engine handles the full decision-support idiom
set with scale-correct plans.

Plan discipline: every money aggregate is a decimal-staged ``dsum`` /
``davg`` (order-independent under parallel partials, bit-equal to the
DuckDB oracle); small aggregated sides broadcast; the only unavoidable
shuffles are on the natural group/join keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strategy_analyzer_exporter_spark.functions import davg, davg_sql, dsum, dsum_sql
from strategy_analyzer_exporter_spark.registry import register
from strategy_analyzer_exporter_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Q13 shape: customer order-count distribution. Left join so
# zero-order customers appear; two cascading aggregations, the second
# over a domain of at most a few hundred counts.


def _q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


register(
    "q13_order_count_distribution",
    _q_order_count_distribution,
    """WITH per_cust AS (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY c_count""",
)


# ---------------------------------------------------------------------------
# Q15 shape: supplier(s) with the maximum revenue. The revenue relation
# is one shuffle on l_suppkey with map-side partials; the max is a
# single-row broadcast joined back on double equality (safe: both sides
# are the same dsum doubles).


def _q_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.mx)
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


register(
    "q15_top_revenue_supplier",
    _q_top_revenue_supplier,
    f"""WITH rev AS (
    SELECT l_suppkey, {dsum_sql("l_extendedprice * (1 - l_discount)")} AS total_revenue
    FROM lineitem GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""",
)


# ---------------------------------------------------------------------------
# Q16 shape: per (brand, type, size), distinct suppliers able to supply,
# excluding a supplier denylist (not-in → left-anti). The denylist is a
# fixed ~6% FRACTION of supplier — it scales with the data, so no
# explicit broadcast hint (a hint overrides Spark's size threshold and
# OOMs executors at scale; AQE still broadcasts while genuinely small —
# VERDICT r05 #3). count_distinct shuffles once on the group keys.


def _q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_size").isin(1, 2, 3, 4, 5))
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_key")
    )
    ok = li.join(bad, li.l_suppkey == bad.bad_key, "left_anti")
    return (
        p.join(ok, p.p_partkey == ok.l_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


register(
    "q16_supplier_part_counts",
    _q_supplier_part_counts,
    """SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_size IN (1, 2, 3, 4, 5)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size""",
)


# ---------------------------------------------------------------------------
# Q18 shape: large-volume orders — orders whose total quantity clears a
# threshold (having-gated subquery), rejoined to customer detail. The
# qualifying key set at threshold 150 is ~19% of orders (measured
# 2,911/15,000 at sf0.01) and grows linearly with data — NOT a
# broadcast-hint candidate (VERDICT r05 #2): plain equi-join, AQE
# broadcasts only while the side is genuinely under threshold.


Q18_QTY_THRESHOLD = 150


def _q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > Q18_QTY_THRESHOLD)
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty"
        )
    )


register(
    "q18_large_orders",
    _q_large_orders,
    f"""WITH big AS (
    SELECT l_orderkey, {dsum_sql("l_quantity")} AS total_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING {dsum_sql("l_quantity")} > {Q18_QTY_THRESHOLD}
)
SELECT c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM orders JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey""",
)


# ---------------------------------------------------------------------------
# Q22 shape: well-funded customers with no LARGE orders, per nation —
# an anti-join plus a scalar-average gate. The scalar is a one-row
# broadcast; the anti join shuffles on custkey (or broadcasts at small
# SF under AQE).
#
# r11 recalibration: "no orders at all" was VACUOUS on this corpus
# (every gate-scale customer has an order — zero output rows since
# r01); anti-joining against the > 400k-price subset yields 7 / 88 /
# 944 qualifying customers at sf0.001/0.01/0.1 (measured), so the
# anti-join + scalar gate combination is value-checked on real rows.


def _q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    avg_pos = c.filter(F.col("c_acctbal") > 0).agg(
        davg("c_acctbal").alias("avg_bal")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000.0)
        .select("o_custkey")
    )
    rich = c.join(F.broadcast(avg_pos)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        dsum("c_acctbal").alias("totacctbal"),
    )


register(
    "q22_idle_rich_customers",
    _q_idle_rich_customers,
    f"""SELECT c_nationkey, count(*) AS numcust,
       {dsum_sql("c_acctbal")} AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT {davg_sql("c_acctbal")} FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
GROUP BY c_nationkey""",
)


# ---------------------------------------------------------------------------
# SCD2 shape: build slowly-changing-dimension validity intervals from an
# event log — each (user, event_type) observation opens an interval that
# closes when the next observation for that user arrives. One window
# shuffle on user_id; the standard change-data-capture → dimension-table
# transform of a warehouse load.


def _q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    # open intervals close at the SCD2 high date (not NULL): the
    # warehouse convention (2100 here: year-9999 overflows
    # nanosecond epoch ranges), and it keeps BETWEEN probes
    # sargable without COALESCE at read time
    return ev.select(
        "user_id",
        "event_type",
        "value",
        F.col("ts").alias("valid_from"),
        F.coalesce(nxt, F.lit("2100-01-01 00:00:00").cast("timestamp")).alias(
            "valid_to"
        ),
        nxt.isNull().alias("is_current"),
    )


register(
    "scd2_intervals",
    _q_scd2_intervals,
    """SELECT user_id, event_type, value,
       ts AS valid_from,
       coalesce(lead(ts) OVER w, TIMESTAMP '2100-01-01 00:00:00') AS valid_to,
       lead(ts) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
)


# ---------------------------------------------------------------------------
# Distribution window functions: percent_rank / cume_dist / ntile.
# percent_rank and cume_dist divide exact integer rank/row counts once
# in double, so both engines produce identical floats; ntile is pure
# integers. Deterministic tie-break on the key column.


def _q_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


register(
    "window_distribution_ranks",
    _q_distribution_ranks,
    """SELECT c_custkey, c_mktsegment, c_acctbal,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""",
)


# ---------------------------------------------------------------------------
# Typed JSON parsing: from_json with an explicit schema (vs the stringly
# get_json_object path in scalar_json_extract) — the struct field feeds
# a predicate and an aggregation, proving the parse is typed end-to-end.


def _q_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    ev = _t(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = ev.select(
        "event_type", F.from_json("props", schema).alias("p")
    ).select("event_type", F.col("p.k").alias("k"))
    return (
        parsed.filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_high"),
            F.sum("k").alias("sum_high"),
        )
    )


register(
    "scalar_json_struct",
    _q_json_struct,
    """SELECT event_type, count(*) AS n_high,
       CAST(sum(k) AS BIGINT) AS sum_high
FROM (
    SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
) WHERE k > 50 GROUP BY event_type""",
)


# ---------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys match
# each other instead of vanishing — the semantics ETL needs when a
# "missing" dimension value is itself a joinable category.


def _q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nk_c")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.nullif(F.col("s_nationkey"), F.lit(0)).alias("nk_s")
    )
    cg = c.groupBy("nk_c").agg(F.count(F.lit(1)).alias("n_cust"))
    sg = s.groupBy("nk_s").agg(F.count(F.lit(1)).alias("n_supp"))
    return cg.join(sg, cg.nk_c.eqNullSafe(sg.nk_s)).select(
        F.col("nk_c").alias("nationkey_nullable"), "n_cust", "n_supp"
    )


register(
    "join_null_safe",
    _q_null_safe_join,
    """WITH cg AS (
    SELECT nullif(c_nationkey, 0) AS nk, count(*) AS n_cust
    FROM customer GROUP BY 1
), sg AS (
    SELECT nullif(s_nationkey, 0) AS nk, count(*) AS n_supp
    FROM supplier GROUP BY 1
)
SELECT cg.nk AS nationkey_nullable, n_cust, n_supp
FROM cg JOIN sg ON cg.nk IS NOT DISTINCT FROM sg.nk""",
)


# ---------------------------------------------------------------------------
# Cross-engine table checksum: an order-independent content digest
# (row-hash sum) + row count per table. The migration-validation tool:
# two engines (or two copies of a 100 TB table) agree iff counts and
# checksums agree, with no sorting and one map-only pass + a scalar
# aggregate. Only integer/string/date columns feed the hash — float
# formatting is not portable across engines.


def _q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strategy_analyzer_exporter_spark.functions import (
        hex8_to_long_sql as _hex8_to_long,
    )

    def one(table: str, cols: str) -> DataFrame:
        d = _t(spark, sf_dir, table)
        row_hash = F.expr(
            _hex8_to_long(f"substring(md5(concat_ws('|', {cols})), 1, 8)")
        )
        return d.select(row_hash.alias("h")).agg(
            F.lit(table).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("h").alias("checksum"),
        )

    return one("orders", "o_orderkey, o_custkey, o_orderstatus, o_orderpriority").unionAll(
        one("customer", "c_custkey, c_name, c_mktsegment")
    )


def _checksum_oracle() -> str:
    from strategy_analyzer_exporter_spark.functions import (
        hex8_to_long_sql as _hex8_to_long,
    )

    def one(table: str, cols: str) -> str:
        h = _hex8_to_long(f"substring(md5(concat_ws('|', {cols})), 1, 8)")
        return (
            f"SELECT '{table}' AS table_name, count(*) AS n_rows,\n"
            f"       CAST(sum({h}) AS BIGINT) AS checksum FROM {table}"
        )

    return (
        one("orders", "o_orderkey, o_custkey, o_orderstatus, o_orderpriority")
        + "\nUNION ALL\n"
        + one("customer", "c_custkey, c_name, c_mktsegment")
    )


register("table_checksum", _q_table_checksum, _checksum_oracle())
