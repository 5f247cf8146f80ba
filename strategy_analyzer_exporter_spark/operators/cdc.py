"""CDC merge/upsert (the MERGE INTO shape, lake-format-free).

Every warehouse ingests change streams: a base snapshot plus a batch
of inserts/updates/deletes keyed by primary key, merged into the next
snapshot. Table formats (Delta/Iceberg/Hudi) sugar this as MERGE INTO;
the underlying algebra — and what this operator implements — is a
single FULL OUTER join on the key with per-row resolution:

    delete  → row dropped
    update  → change values win
    insert  → change row appears
    else    → base row carries over

The change batch here is derived deterministically from ``orders``
(delete keys ≡ 0 mod 23, update keys ≡ 0 mod 10, inserted keys are
shifted past max(o_orderkey)), so both engines build the identical
change set and the merged snapshot is value-exact. At scale this is
one shuffle on the join key for each side (or zero with bucketed
base tables — see sinks.write_bucketed_table); the resolution is
pure projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strategy_analyzer_exporter_spark.registry import register
from strategy_analyzer_exporter_spark.sources.tables import load_table

_COLS = (
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def _q_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load_table(spark, sf_dir, "orders")
    shift = base.agg((F.max("o_orderkey") + 1).alias("shift"))

    deletes = base.filter(F.col("o_orderkey") % 23 == 0).select(
        "o_orderkey", F.lit("D").alias("op"), *[F.col(c) for c in _COLS]
    )
    updates = (
        base.filter((F.col("o_orderkey") % 10 == 0) & (F.col("o_orderkey") % 23 != 0))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1000.0))
        .withColumn("o_orderstatus", F.lit("U"))
        .select("o_orderkey", F.lit("U").alias("op"), *[F.col(c) for c in _COLS])
    )
    inserts = (
        base.filter(F.col("o_orderkey") % 17 == 0)
        .crossJoin(F.broadcast(shift))
        .select(
            (F.col("o_orderkey") + F.col("shift")).alias("o_orderkey"),
            F.lit("I").alias("op"),
            *[F.col(c) for c in _COLS],
        )
    )
    changes = deletes.unionByName(updates).unionByName(inserts)

    b = base.select(F.col("o_orderkey").alias("bk"), *[F.col(c).alias(f"b_{c}") for c in _COLS])
    c = changes.select(
        F.col("o_orderkey").alias("ck"), "op", *[F.col(x).alias(f"c_{x}") for x in _COLS]
    )
    merged = b.join(c, b.bk == c.ck, "full_outer").filter(
        ~F.col("op").eqNullSafe("D")
    )
    take_change = F.col("op").isin("U", "I")
    return merged.select(
        F.coalesce("ck", "bk").alias("o_orderkey"),
        *[
            F.when(take_change, F.col(f"c_{x}")).otherwise(F.col(f"b_{x}")).alias(x)
            for x in _COLS
        ],
    )


_CDC_ORACLE = """WITH shift AS (
    SELECT max(o_orderkey) + 1 AS s FROM orders
),
changes AS (
    SELECT o_orderkey, 'D' AS op, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 23 = 0
    UNION ALL
    SELECT o_orderkey, 'U', o_custkey, 'U', o_totalprice + 1000.0,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 10 = 0 AND o_orderkey % 23 <> 0
    UNION ALL
    SELECT o_orderkey + (SELECT s FROM shift), 'I', o_custkey, o_orderstatus,
           o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 17 = 0
)
SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN c.op IN ('U', 'I') THEN c.o_custkey ELSE b.o_custkey END AS o_custkey,
       CASE WHEN c.op IN ('U', 'I') THEN c.o_orderstatus ELSE b.o_orderstatus END AS o_orderstatus,
       CASE WHEN c.op IN ('U', 'I') THEN c.o_totalprice ELSE b.o_totalprice END AS o_totalprice,
       CASE WHEN c.op IN ('U', 'I') THEN c.o_orderdate ELSE b.o_orderdate END AS o_orderdate,
       CASE WHEN c.op IN ('U', 'I') THEN c.o_orderpriority ELSE b.o_orderpriority END AS o_orderpriority
FROM orders b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
WHERE c.op IS NULL OR c.op <> 'D'"""


register("cdc_merge_upsert", _q_cdc_merge, _CDC_ORACLE)
