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

# Registrations that must wait for other queries' oracles — composite
# queries whose oracle SQL embeds other queries' oracles (e.g.
# ann_recall). A module-level sibling import would crash when the
# sibling is the partially-initialized ENTRY import (see
# tests/test_pipeline_ops.py::test_operator_modules_import_standalone),
# and a flat "run after _load_all" hook breaks in the same scenario
# (the entry module's own body — and registrations — complete only
# AFTER _load_all returns). So each deferral declares the names it
# needs and is flushed as soon as the last one registers, whatever the
# import order.
_PENDING: list[tuple[tuple[str, ...], Callable[[], None]]] = []
_FLUSHING = False


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle
    _flush_deferred()


def register_deferred(fn: Callable[[], None], requires: tuple[str, ...]) -> None:
    _PENDING.append((tuple(requires), fn))
    _flush_deferred()


def _flush_deferred() -> None:
    global _FLUSHING
    if _FLUSHING:
        return
    _FLUSHING = True
    try:
        progress = True
        while progress:
            progress = False
            for item in list(_PENDING):
                req, cb = item
                if set(req) <= ORACLES.keys():
                    _PENDING.remove(item)
                    cb()
                    progress = True
    finally:
        _FLUSHING = False


def _load_all() -> None:
    """Import every operator module for its registration side effects."""
    from strategy_analyzer_exporter_spark.operators import (  # noqa: F401
        ann_recall,
        bucketed,
        cdc,
        dedup,
        etl,
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
