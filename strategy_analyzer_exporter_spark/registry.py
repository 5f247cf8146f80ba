"""Query + oracle registry — the single source of truth for the driver
contract (``__spark_entry__.queries()`` / ``oracle_sql()``).

Each operator module registers ``(name, spark_fn, oracle_sql_or_None)``
triples here. A ``None`` oracle means the op is not SQL-expressible and
gets the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


def _load_all() -> None:
    """Import every operator module for its registration side effects."""
    from strategy_analyzer_exporter_spark.operators import (  # noqa: F401
        cdc,
        dedup,
        extra_queries,
        feature_queries,
        finance,
        graph,
        mixture,
        multimodal,
        pii,
        pipeline,
        pipeline3,
        pq,
        profiling,
        quality,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
        resample,
        similarity,
        sources_formats,
        text,
        tpch2,
        udf_surface,
    )


_load_all()
