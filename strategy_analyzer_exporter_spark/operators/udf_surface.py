"""UDF plugin surface (SURVEY.md §2.6): the reference's extension story
is "write another static compute class" (reference README.md:17,33); the
Spark engine exposes all three Arrow-vectorized Python UDF flavors:

- scalar pandas UDF        (Series -> Series, here `net_price`)
- grouped-agg pandas UDF   (Series -> scalar, here `val_range`/`n_rows`)
- grouped-map applyInPandas (operators/features.py EMA)
- mapInPandas              (operators/dedup.py shingling, multimodal.py)

The demo query is built to be oracle-exact: the scalar UDF uses only
exactly-rounded IEEE double ops (same bits in numpy and DuckDB), and the
grouped aggregates are order-independent (max-min, count), so the Arrow
boundary cannot perturb values.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strategy_analyzer_exporter_spark.registry import register
from strategy_analyzer_exporter_spark.sources.tables import load_table


def _make_udfs():
    """UDFs are built lazily: pandas_udf parses its returnType with the
    active SparkSession, so decorating at import time would make merely
    importing this module require a session."""

    @F.pandas_udf("double")
    def net_price(ep: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        # scalar pandas UDF: discounted, taxed line price. Multiply and
        # subtract are exactly rounded → bit-identical to the SQL twin.
        return ep * (1.0 - disc) * (1.0 + tax)

    @F.pandas_udf("double")
    def val_range(v: pd.Series) -> float:
        # grouped-agg pandas UDF: max - min (order-independent, exact)
        return float(v.max() - v.min())

    @F.pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        # grouped-agg pandas UDF: group size
        return len(v)

    return net_price, val_range, n_rows


def _q_udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    _net_price, _val_range, _n_rows = _make_udfs()
    li = load_table(spark, sf_dir, "lineitem")
    priced = li.select(
        "l_returnflag",
        _net_price("l_extendedprice", "l_discount", "l_tax").alias("x"),
    )
    return priced.groupBy("l_returnflag").agg(
        _val_range("x").alias("price_range"),
        _n_rows("x").alias("n_rows"),
    )


register(
    "udf_surface",
    _q_udf_surface,
    """SELECT l_returnflag,
       max(x) - min(x) AS price_range,
       count(*) AS n_rows
FROM (SELECT l_returnflag,
             l_extendedprice * (1 - l_discount) * (1 + l_tax) AS x
      FROM lineitem)
GROUP BY l_returnflag""",
)
