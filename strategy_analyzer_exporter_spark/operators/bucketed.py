"""Bucketed-at-rest table surface (VERDICT r06 #2).

Every other query in this engine proves a shuffle-minimal plan *per
query*; this module exercises Spark's answer for REPEATED passes over
the same corpus: write once as a bucketed+sorted table, then every
doc_id-keyed join/aggregation over the read-back is exchange-free — the
at-rest analogue of the reference's single persistent DuckDB table
(DatabaseWriter.cs:252, SURVEY §1.4). At 100 TB this is the difference
between paying the corpus shuffle once at ingest and paying it on every
dedup/join pass.

Layout discipline: ``df.repartition(N_BUCKETS, key)`` before
``bucketBy(N_BUCKETS, key).sortBy(key)`` uses the same murmur3 hash
partitioning as the bucketed write, so each task holds exactly one
bucket's rows → ONE file per bucket. Single-file buckets let the
read-back scan advertise both hashpartitioning(key) and per-bucket
sort order, so downstream joins skip the exchange (and Spark can skip
sorts on the pre-sorted side).

Tables are written under ``staging_root()`` (SPARK_GRAFT_TMP_DIR
discipline) as EXTERNAL tables — the warehouse path never depends on
the process cwd — and memoized per (session, sf_dir): catalog presence
is the idempotence check, so a fresh session rebuilds its catalog entry
by overwriting the path (cheap at test SF; a production deployment
registers the table once in a shared metastore instead).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strategy_analyzer_exporter_spark.functions import TOKENS_SQL, tokens
from strategy_analyzer_exporter_spark.registry import register
from strategy_analyzer_exporter_spark.sources.staging import (
    staging_root,
    staging_suffix,
)
from strategy_analyzer_exporter_spark.sources.tables import load_table

N_BUCKETS = 8


def _suffix(sf_dir: str) -> str:
    # per-SESSION staleness only: catalog absence in a fresh session
    # triggers a full overwrite of the path, so unlike the media-file
    # staging no corpus fingerprint is needed in the key
    return staging_suffix(os.path.abspath(sf_dir))


def _write_bucketed(df: DataFrame, table: str, key: str) -> None:
    path = os.path.join(staging_root(), "bucketed", table)
    (
        df.repartition(N_BUCKETS, key)
        .write.bucketBy(N_BUCKETS, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_doc_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Ensure the two bucketed tables for ``sf_dir`` exist and return
    their names: docs (doc_id, doc_len) and token rows (doc_id, token),
    both bucketed+sorted by doc_id with one file per bucket."""
    suf = _suffix(sf_dir)
    docs_tbl = f"bkt_docs_{suf}"
    toks_tbl = f"bkt_tokens_{suf}"
    if not spark.catalog.tableExists(docs_tbl):
        d = load_table(spark, sf_dir, "documents")
        _write_bucketed(
            d.select("doc_id", F.length("text").cast("long").alias("doc_len")),
            docs_tbl,
            "doc_id",
        )
    if not spark.catalog.tableExists(toks_tbl):
        d = load_table(spark, sf_dir, "documents")
        _write_bucketed(
            d.select(
                "doc_id", F.explode(tokens(F.col("text"))).alias("token")
            ),
            toks_tbl,
            "doc_id",
        )
    return docs_tbl, toks_tbl


def _q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read-back join over the bucketed layout: per-doc token counts
    (groupBy on the bucket key — no exchange, the bucketed scan already
    provides hashpartitioning(doc_id)) joined to the bucketed docs
    table (sort-merge on the shared bucket layout — no exchange on
    either side). The ``merge`` hint pins SMJ so the plan test proves
    the bucketed path rather than letting AQE broadcast the small test
    side; at 100 TB neither side is broadcastable and SMJ-over-buckets
    is exactly the plan you want. tests/test_plans.py asserts ZERO
    shuffle exchanges in this plan."""
    docs_tbl, toks_tbl = bucketed_doc_tables(spark, sf_dir)
    docs = spark.table(docs_tbl)
    ntok = (
        spark.table(toks_tbl)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
    )
    return (
        docs.hint("merge")
        .join(ntok, "doc_id")
        .select("doc_id", "doc_len", "n_tokens")
    )


_BUCKETED_ORACLE = f"""WITH toks AS (
    SELECT doc_id, length(text) AS doc_len, {TOKENS_SQL} AS t
    FROM documents
)
SELECT doc_id, doc_len, len(t) AS n_tokens
FROM toks
WHERE len(t) >= 1"""


register("source_bucketed_join", _q_bucketed_join, _BUCKETED_ORACLE)
