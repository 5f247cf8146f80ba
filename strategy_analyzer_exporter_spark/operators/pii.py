"""PII detection / scrubbing over ``documents`` (LLM-pipeline surface).

A real pre-training pipeline runs PII scrubbing (emails, phone
numbers) before anything ships. The corpus here contains no organic
PII, so each engine PLANTS deterministic contact strings first (email
for doc_id % 7 == 0, phone for doc_id % 11 == 0, built from doc_id by
identical concat/lpad expressions in both engines) and then must find
and mask exactly those occurrences by regex. The md5 of the masked
text certifies that detection AND replacement behave identically —
a lazy implementation that, say, replaces only the first hit or
mis-anchors the pattern breaks the value hash.

Regex stays in the Java-regex ∩ RE2 common subset (character classes,
bounded repetition, no lookaround) so Spark and DuckDB agree; this is
also the subset that stays linear-time at 100 TB scan scale. The whole
operator is map-only — no shuffle, column-pruned scan, the featurizer
plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from strategy_analyzer_exporter_spark.registry import register
from strategy_analyzer_exporter_spark.sources.tables import load_table

EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


def _augmented(text: Column, doc_id: Column) -> Column:
    """Text with planted contact strings (identical expression in the
    oracle — see _AUG_SQL)."""
    with_email = F.when(
        doc_id % 7 == 0,
        F.concat(
            text,
            F.lit(" contact user"),
            doc_id.cast("string"),
            F.lit("@example.com now"),
        ),
    ).otherwise(text)
    return F.when(
        doc_id % 11 == 0,
        F.concat(
            with_email,
            F.lit(" call 555-"),
            F.lpad((doc_id % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((doc_id % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(with_email)


_AUG_SQL = """CASE WHEN doc_id % 11 = 0 THEN
    (CASE WHEN doc_id % 7 = 0
          THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
          ELSE text END)
    || ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
    || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
ELSE
    (CASE WHEN doc_id % 7 = 0
          THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
          ELSE text END)
END"""


def _q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    aug = _augmented(F.col("text"), F.col("doc_id"))
    masked = F.regexp_replace(
        F.regexp_replace(aug, F.lit(EMAIL_RE), F.lit("<EMAIL>")),
        F.lit(PHONE_RE),
        F.lit("<PHONE>"),
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(aug, F.lit(EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(aug, F.lit(PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.length(masked).cast("long").alias("masked_len"),
        F.md5(F.encode(masked, "UTF-8")).alias("masked_md5"),
    )


_PII_ORACLE = f"""WITH aug AS (
    SELECT doc_id, {_AUG_SQL} AS a FROM documents
),
masked AS (
    SELECT doc_id, a,
           regexp_replace(regexp_replace(a, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{PHONE_RE}', '<PHONE>', 'g') AS m
    FROM aug
)
SELECT doc_id,
       CAST(len(regexp_extract_all(a, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(a, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(length(m) AS BIGINT) AS masked_len,
       md5(m) AS masked_md5
FROM masked"""


def _q_pii_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus totals: documents touched and patterns masked — the
    audit line a scrub job reports."""
    s = _q_pii_scrub(spark, sf_dir)
    return s.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_emails") > 0).cast("long")).alias("docs_with_email"),
        F.sum((F.col("n_phones") > 0).cast("long")).alias("docs_with_phone"),
        F.sum("n_emails").alias("total_emails"),
        F.sum("n_phones").alias("total_phones"),
    )


_PII_ROLLUP_ORACLE = f"""WITH aug AS (
    SELECT doc_id, {_AUG_SQL} AS a FROM documents
),
per_doc AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(a, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(a, '{PHONE_RE}')) AS BIGINT) AS n_phones
    FROM aug
)
SELECT count(*) AS n_docs,
       CAST(sum(CASE WHEN n_emails > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
       CAST(sum(CASE WHEN n_phones > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_phone,
       CAST(sum(n_emails) AS BIGINT) AS total_emails,
       CAST(sum(n_phones) AS BIGINT) AS total_phones
FROM per_doc"""


register("pii_email_scrub", _q_pii_scrub, _PII_ORACLE)
register("pii_scrub_rollup", _q_pii_rollup, _PII_ROLLUP_ORACLE)
