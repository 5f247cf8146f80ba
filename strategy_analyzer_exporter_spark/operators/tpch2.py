"""TPC-H decision-support wave 2: the classic query shapes (Q3, Q4,
Q5, Q7, Q8, Q9, Q10, Q11, Q14, Q17) adapted to the slimmed testdata
schema (no partsupp table; lineitem carries no commit/receipt dates or
shipmode — queries needing those substitute the nearest available
predicate, noted per query). Together with relational*.py this
completes the TPC-H idiom coverage: every join topology, correlated
scalar, exists/anti, ratio-of-sums and top-N-with-ties shape.

The reference engine has no relational surface (SURVEY.md §2.6);
these exist to prove the generalized engine handles the full
decision-support idiom set with scale-correct plans.

Plan discipline (same as relational5.py): money aggregates are
decimal-staged ``dsum``/``davg`` (order-independent under parallel
partials, bit-equal to DuckDB); dimension sides broadcast; ratios are
single divisions of identically-computed doubles (bit-exact); top-N
orders by (measure desc, key asc) — a total order, so the row set is
deterministic in both engines — and runs as TakeOrderedAndProject
with the rank attached over only the k survivors
(functions/topk.take_ordered_ranked), never as an unpartitioned
global-sort window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strategy_analyzer_exporter_spark.functions import davg, davg_sql, dsum, dsum_sql
from strategy_analyzer_exporter_spark.functions.topk import take_ordered_ranked
from strategy_analyzer_exporter_spark.registry import register
from strategy_analyzer_exporter_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_REV = "l_extendedprice * (1 - l_discount)"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q3: shipping priority — top 10 undelivered orders by revenue for one
# market segment. The filtered customer keys are a fixed ~1/5 FRACTION
# of customer — they scale with data, so no broadcast hint (AQE
# broadcasts while genuinely small; r06 hint sweep). One shuffle on
# l_orderkey for the revenue aggregation; top-N via a total order.

_Q3_DATE = "1997-06-01"


def _q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_Q3_DATE).cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_Q3_DATE).cast("timestamp")
    ).select("l_orderkey", _rev().alias("rev"))
    grouped = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum("rev").alias("revenue"))
    )
    return take_ordered_ranked(
        grouped, [F.col("revenue").desc(), F.col("o_orderkey")], 10
    ).select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority", "rn")


_Q3_ORACLE = f"""WITH grouped AS (
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           {dsum_sql(_REV)} AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '{_Q3_DATE}'
      AND l_shipdate > TIMESTAMP '{_Q3_DATE}'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
)
SELECT o_orderkey, revenue, o_orderdate, o_orderpriority, rn FROM (
    SELECT *, row_number() OVER (ORDER BY revenue DESC, o_orderkey) AS rn
    FROM grouped
) WHERE rn <= 10"""


# ---------------------------------------------------------------------------
# Q4: order-priority checking — orders in one quarter with at least one
# line item shipped more than 30 days after ordering (the slimmed
# schema's stand-in for commitdate < receiptdate). EXISTS = left-semi;
# the count by priority is a 5-row aggregate.


def _q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


_Q4_ORACLE = """SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority"""


# ---------------------------------------------------------------------------
# Q5: local supplier volume — revenue by nation where customer and
# supplier share the nation, within one region and year. The dimension
# chain region→nation broadcasts; the fact-side join tree shuffles on
# its natural keys only.


def _q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _rev().alias("rev")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(dsum("rev").alias("revenue"))
    )


_Q5_ORACLE = f"""SELECT n_name, {dsum_sql(_REV)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name"""


# ---------------------------------------------------------------------------
# Q7: volume shipping — revenue between two nations by shipping
# direction and year. The (supp_nation, cust_nation) pair filter keeps
# both directions; year comes off l_shipdate.


def _q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", _rev().alias("rev"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == n1.s_nk)
        .join(F.broadcast(n2), c.c_nationkey == n2.c_nk)
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg(dsum("rev").alias("revenue"))


_Q7_ORACLE = f"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       {dsum_sql(_REV)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l_shipdate)"""


# ---------------------------------------------------------------------------
# Q8: national market share — NATION_3's share of PROMO-part revenue
# inside ASIA per order year. Ratio of two identically-computed dsum
# doubles → one division, bit-exact cross-engine.


def _q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_cust = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    n_supp = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", _rev().alias("rev")
    )
    base = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_cust), c.c_nationkey == F.col("cn_key"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_supp), s.s_nationkey == F.col("sn_key"))
    )
    return (
        base.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            dsum(F.when(F.col("supp_nation") == "NATION_3", F.col("rev")).otherwise(0.0)).alias("nation_rev"),
            dsum("rev").alias("total_rev"),
        )
        .select(
            "o_year",
            "nation_rev",
            "total_rev",
            (F.col("nation_rev") / F.col("total_rev")).alias("mkt_share"),
        )
    )


_Q8_ORACLE = f"""WITH base AS (
    SELECT EXTRACT(year FROM o_orderdate) AS o_year, n2.n_name AS supp_nation,
           {_REV} AS rev
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
),
agg AS (
    SELECT CAST(o_year AS BIGINT) AS o_year,
           {dsum_sql("CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0.0 END")} AS nation_rev,
           {dsum_sql('rev')} AS total_rev
    FROM base GROUP BY o_year
)
SELECT o_year, nation_rev, total_rev, nation_rev / total_rev AS mkt_share
FROM agg"""


# ---------------------------------------------------------------------------
# Q9: product-type profit — by supplier nation and order year, for
# parts of one type family. No partsupp in this schema, so cost =
# p_retailprice * l_quantity stands in for ps_supplycost * l_quantity
# (same expression topology: fact × part-attribute product).

_Q9_AMOUNT = "l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity"


def _q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_name").contains("widget")
    ).select("p_partkey", "p_retailprice")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem")
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            (
                _rev() - F.col("p_retailprice") * F.col("l_quantity")
            ).alias("amount"),
        )
    )
    return joined.groupBy("nation", "o_year").agg(dsum("amount").alias("sum_profit"))


_Q9_ORACLE = f"""SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       {dsum_sql(_Q9_AMOUNT)} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, EXTRACT(year FROM o_orderdate)"""


# ---------------------------------------------------------------------------
# Q10: returned-item reporting — top 20 customers by lost revenue in a
# quarter. Aggregate on c_custkey (one shuffle), then a total-order
# top-N.


def _q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", _rev().alias("rev"))
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    grouped = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum("rev").alias("revenue"))
    )
    return take_ordered_ranked(
        grouped, [F.col("revenue").desc(), F.col("c_custkey")], 20
    ).select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "rn")


_Q10_ORACLE = f"""WITH grouped AS (
    SELECT c_custkey, c_name, c_acctbal, n_name, {dsum_sql(_REV)} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
)
SELECT c_custkey, c_name, revenue, c_acctbal, n_name, rn FROM (
    SELECT *, row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rn
    FROM grouped
) WHERE rn <= 20"""


# ---------------------------------------------------------------------------
# Q11: important stock — parts whose lineitem revenue exceeds a
# multiple of the MEAN per-part revenue (partsupp-free adaptation).
#
# r11 recalibration: the original fixed-fraction-of-total threshold
# (0.002) only returns rows when the corpus has ≤ 500 parts — at
# sf0.01/0.1 every part's share is below it, so the gate had compared
# ZERO rows since r01 (and sf0.001, where it DID return rows, is only
# the local suite's scale). A mean-relative threshold is scale-free by
# construction: 1.5× the mean share returns 2 / 29 / 252 parts at
# sf0.001/0.01/0.1 (measured — the synthetic revenue-per-part
# distribution is tight, max ≈ 1.8× mean, so 2× returned nothing).
# Exactness: total_value is the decimal-exact dsum, n_parts an integer
# count; mean = one double divide, threshold = one multiply — the
# comparison operands are bit-identical across engines.

_Q11_MEAN_MULT = 1.5


def _q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", _rev().alias("rev"))
    per_part = li.groupBy("l_partkey").agg(dsum("rev").alias("part_value"))
    total = li.agg(
        dsum("rev").alias("total_value"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )
    thr = F.lit(_Q11_MEAN_MULT) * (
        F.col("total_value") / F.col("n_parts").cast("double")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > thr)
        .select("l_partkey", "part_value")
    )


_Q11_ORACLE = f"""WITH per_part AS (
    SELECT l_partkey, {dsum_sql(_REV)} AS part_value
    FROM lineitem GROUP BY l_partkey
),
total AS (SELECT {dsum_sql(_REV)} AS total_value,
                 count(DISTINCT l_partkey) AS n_parts FROM lineitem)
SELECT l_partkey, part_value FROM per_part, total
WHERE part_value > {_Q11_MEAN_MULT} * (total_value / CAST(n_parts AS DOUBLE))"""


# ---------------------------------------------------------------------------
# Q14: promotion effect — percent of one month's revenue from PROMO
# parts. 100 * ratio of two dsums: two single ops, bit-exact.


def _q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("l_partkey", _rev().alias("rev"))
    joined = li.join(p, li.l_partkey == p.p_partkey)
    return joined.agg(
        dsum(F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(0.0)).alias("promo_rev"),
        dsum("rev").alias("total_rev"),
    ).select(
        "promo_rev",
        "total_rev",
        (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev")).alias("promo_pct"),
    )


_Q14_ORACLE = f"""WITH agg AS (
    SELECT {dsum_sql(f"CASE WHEN p_type = 'PROMO' THEN {_REV} ELSE 0.0 END")} AS promo_rev,
           {dsum_sql(_REV)} AS total_rev
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
)
SELECT promo_rev, total_rev, 100.0 * promo_rev / total_rev AS promo_pct FROM agg"""


# ---------------------------------------------------------------------------
# Q17: small-quantity-order revenue — lineitems under 20% of their
# part's average quantity, for one brand; result divided by 7 (the
# classic "average yearly"). The correlated scalar becomes a per-part
# aggregate joined back (one extra shuffle on l_partkey, which the
# aggregation already required).


def _q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li_branded = li.join(p, li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_q = li_branded.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        davg("l_quantity").alias("avg_qty")
    )
    small = li_branded.join(avg_q, li_branded.l_partkey == avg_q.ap_key).filter(
        F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty")
    )
    return small.agg(
        (dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly")
    )


_Q17_ORACLE = f"""WITH li_branded AS (
    SELECT l_partkey, l_quantity, l_extendedprice
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#1'
),
avg_q AS (
    SELECT l_partkey AS ap_key, {davg_sql('l_quantity')} AS avg_qty
    FROM li_branded GROUP BY l_partkey
)
SELECT {dsum_sql('l_extendedprice')} / 7.0 AS avg_yearly
FROM li_branded JOIN avg_q ON l_partkey = ap_key
WHERE l_quantity < 0.2 * avg_qty"""


register("q3_shipping_priority", _q3, _Q3_ORACLE)
register("q4_order_priority", _q4, _Q4_ORACLE)
register("q5_local_supplier_volume", _q5, _Q5_ORACLE)
register("q7_volume_shipping", _q7, _Q7_ORACLE)
register("q8_market_share", _q8, _Q8_ORACLE)
register("q9_product_profit", _q9, _Q9_ORACLE)
register("q10_returned_items", _q10, _Q10_ORACLE)
register("q11_important_parts", _q11, _Q11_ORACLE)
register("q14_promo_effect", _q14, _Q14_ORACLE)
register("q17_small_quantity", _q17, _Q17_ORACLE)
