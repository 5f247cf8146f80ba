"""Source-format parity: the same relation read through CSV and JSONL
readers must produce the same answers as the parquet scan.

The reference reads one in-memory bar source and writes one DuckDB
sink; the generalized engine reads whatever lands in the lake. These
queries stage ``documents`` (arbitrary text — embedded quotes, commas,
multiline risk) through ``df.write.csv`` / ``df.write.json`` once per
process, read it back with an explicit schema (never inferSchema — a
schema scan at 100 TB is a full extra pass), and aggregate. The oracle
runs on the original parquet, so any quoting/escaping defect in either
the writer or the reader shows up as a value mismatch.

Integer-only outputs: format roundtripping of floats/timestamps is a
serialization question (text formats carry fewer guarantees), while
counts and exact byte lengths prove the *content* survived.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from strategy_analyzer_exporter_spark.registry import register
from strategy_analyzer_exporter_spark.sources.tables import load_table

_STAGED: set[str] = set()


def _staging_root() -> str:
    """Shared staging root (sources/staging.py): honors
    ``SPARK_GRAFT_TMP_DIR``, falls back to a per-user tempdir — never a
    path hardcoded to this container's repo location."""
    from strategy_analyzer_exporter_spark.sources.staging import staging_root

    return staging_root()

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_AGG_ORACLE = """SELECT lang, count(*) AS n_docs,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ids,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY lang"""


def _stage(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    path = os.path.join(
        _staging_root(), f"docs_{fmt}_" + sf_dir.strip("/").split("/")[-1]
    )
    if path not in _STAGED:
        d = load_table(spark, sf_dir, "documents").select(
            [f.name for f in DOC_SCHEMA.fields]
        )
        w = d.write.mode("overwrite")
        if fmt == "csv":
            # header off (schema is explicit), full quoting with escaped
            # quotes — the only mode that survives arbitrary text
            w.option("quoteAll", True).option("escape", '"').csv(path)
        elif fmt == "orc":
            w.orc(path)
        else:
            w.json(path)
        _STAGED.add(path)
    return path


def _agg(d: DataFrame) -> DataFrame:
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("doc_id").alias("n_ids"),
        F.sum(F.length("text")).alias("total_chars"),
    )


def _q_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _stage(spark, sf_dir, "csv")
    d = spark.read.schema(DOC_SCHEMA).option("quote", '"').option(
        "escape", '"'
    ).csv(path)
    return _agg(d)


def _q_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _stage(spark, sf_dir, "jsonl")
    d = spark.read.schema(DOC_SCHEMA).json(path)
    return _agg(d)


def _q_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC roundtrip — the second columnar lake format Spark ships a
    native vectorized reader for. Binary-typed columnar storage
    roundtrips every type losslessly (no quoting/escaping surface), so
    a value mismatch here would indicate a reader/writer defect, not a
    serialization convention. Oracle runs on the original parquet."""
    path = _stage(spark, sf_dir, "orc")
    d = spark.read.schema(DOC_SCHEMA).orc(path)
    return _agg(d)


register("source_csv_roundtrip", _q_csv, _AGG_ORACLE)
register("source_jsonl_roundtrip", _q_jsonl, _AGG_ORACLE)
register("source_orc_roundtrip", _q_orc, _AGG_ORACLE)


# ---------------------------------------------------------------------------
# Hive-partitioned parquet roundtrip: write documents partitioned by
# lang, read back with a lang filter, and aggregate. The filter must
# become a PARTITION filter (directory pruning — zero I/O for pruned
# langs, the mechanism that makes a 100 TB lake scannable);
# tests/test_plans.py asserts it. Parquet roundtrips every type
# losslessly, so unlike the text formats this one aggregates floats too.


def _q_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = os.path.join(
        _staging_root(), "docs_part_" + sf_dir.strip("/").split("/")[-1]
    )
    if path not in _STAGED:
        d = load_table(spark, sf_dir, "documents")
        d.write.mode("overwrite").partitionBy("lang").parquet(path)
        _STAGED.add(path)
    d = spark.read.parquet(path).filter(F.col("lang").isin("en", "de"))
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


_PART_ORACLE = """SELECT lang, source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
FROM documents WHERE lang IN ('en', 'de') GROUP BY lang, source"""

register("source_partitioned_pruned", _q_partitioned, _PART_ORACLE)


# ---------------------------------------------------------------------------
# Schema evolution: a lake table whose early files predate two columns.
# Batch 1 (even doc_ids) is written with 3 columns, batch 2 (odd) with
# all 5; reading the directory with mergeSchema=true must unify to the
# widest schema with NULLs for the missing columns — the evolution
# contract every long-lived 100 TB table depends on (schema merging is
# a footer-only operation; data files are never rewritten). The oracle
# reproduces the split from the original parquet with CASE/NULL.


def _stage_evolved(spark: SparkSession, sf_dir: str) -> str:
    path = os.path.join(
        _staging_root(), "docs_evolve_" + sf_dir.strip("/").split("/")[-1]
    )
    if path not in _STAGED:
        d = load_table(spark, sf_dir, "documents")
        (
            d.filter(F.col("doc_id") % 2 == 0)
            .select("doc_id", "text", "lang")
            .write.mode("overwrite")
            .parquet(os.path.join(path, "b1"))
        )
        (
            d.filter(F.col("doc_id") % 2 == 1)
            .select("doc_id", "text", "lang", "source", "n_chars")
            .write.mode("overwrite")
            .parquet(os.path.join(path, "b2"))
        )
        _STAGED.add(path)
    return path


def _q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _stage_evolved(spark, sf_dir)
    d = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(path, "b*")
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count("source").cast("long").alias("n_with_source"),
        F.sum(F.coalesce(F.col("n_chars"), F.lit(0))).cast("long").alias(
            "chars_known"
        ),
    )


register(
    "source_schema_evolution",
    _q_schema_evolution,
    """SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(CASE WHEN doc_id % 2 = 1 THEN source END) AS BIGINT)
           AS n_with_source,
       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE 0 END) AS BIGINT)
           AS chars_known
FROM documents GROUP BY lang""",
)
