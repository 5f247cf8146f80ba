"""Lake-maintenance / data-prep operators: small-file compaction
planning, embedding int8 quantization, and normalized-text dedup.

These are the ETL chores a 100 TB training-data lake runs nightly:
- **Compaction planning**: a lake accumulates small files (streaming
  commits, per-partition writers); scans then pay per-file open cost.
  The planner assigns files to target-size bins with a deterministic
  greedy pack — a partitioned window cumsum, no shuffle beyond the
  partition key, so planning 10^8 files is one pass. (Delta/Iceberg
  OPTIMIZE compute exactly this file→bin map before rewriting.)
- **int8 quantization**: embedding stores ship int8 + per-vector scale
  (4× smaller, SIMD-friendly). Max-abs scaling with an explicit
  ``floor(x + 0.5)`` round — identical IEEE ops in both engines, no
  dependence on either engine's round() tie convention.
- **Normalized dedup**: exact dedup after case/punctuation/whitespace
  normalization — catches reformatted copies that byte-exact dedup
  misses, at the same one-content-hash-shuffle cost.

Everything is expressed over the test tables (documents as the "file"
inventory — each doc a file of n_chars bytes in table-partition lang;
embeddings for quantization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from strategy_analyzer_exporter_spark.registry import register
from strategy_analyzer_exporter_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Compaction bin packing

BIN_TARGET = 32_000  # target compacted size (bytes of text per bin)


def _q_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy in-order bin packing per table partition: files ordered
    by id, bin = floor(exclusive-prefix-bytes / target). All integer
    sums (exact); the single double division is < 2^53 so floor is
    engine-identical. One partitioned window — at scale this plans a
    whole lake partition per task with no extra shuffle."""
    d = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = d.select(
        "lang",
        "doc_id",
        "n_chars",
        F.floor(
            F.coalesce(F.sum("n_chars").over(w), F.lit(0)).cast("double")
            / F.lit(float(BIN_TARGET))
        ).alias("bin_id"),
    )
    return binned.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("n_chars").cast("long").alias("bin_bytes"),
        F.min("doc_id").alias("first_file"),
        F.max("doc_id").alias("last_file"),
    )


_COMPACTION_ORACLE = f"""WITH binned AS (
    SELECT lang, doc_id, n_chars,
           CAST(floor(CAST(coalesce(sum(n_chars) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
             / {float(BIN_TARGET)}) AS BIGINT) AS bin_id
    FROM documents
)
SELECT lang, bin_id,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(n_chars) AS BIGINT) AS bin_bytes,
       min(doc_id) AS first_file,
       max(doc_id) AS last_file
FROM binned GROUP BY lang, bin_id"""

register("compaction_bin_packing", _q_compaction, _COMPACTION_ORACLE)


# ---------------------------------------------------------------------------
# Embedding int8 quantization (max-abs symmetric)

Q_MAX = 127.0


def _maxabs(v: Column) -> Column:
    """Left-fold max of |x| over double-cast elements, seeded with 0.0
    (abs ≥ 0, so the seed never wins) — greatest is order-independent,
    but the pinned fold keeps both engines on one op sequence."""
    return F.aggregate(
        v,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )


def _q_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8: q_i = floor(x_i·127/maxabs + 0.5) — explicit
    half-up via floor so neither engine's round() tie convention is in
    play; all-zero vectors quantize to zeros. Emits the full code
    array plus saturation/summary stats (the store's audit columns).
    Map-only: one scan, no shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    withm = emb.select(
        "vec_id",
        F.col("embedding").alias("v"),
        _maxabs(F.col("embedding")).alias("maxabs"),
    )
    q = F.transform(
        "v",
        lambda x: F.when(F.col("maxabs") == 0.0, F.lit(0))
        .otherwise(
            F.floor(x.cast("double") * F.lit(Q_MAX) / F.col("maxabs") + F.lit(0.5))
        )
        .cast("long"),
    )
    withq = withm.select("vec_id", "maxabs", q.alias("q"))
    # codes serialize to CSV: the cross-engine harness sorts/compares
    # scalar cells, so array outputs ride as strings (the
    # scalar_array_funcs convention)
    return withq.select(
        "vec_id",
        "maxabs",
        F.array_join(F.transform("q", lambda x: x.cast("string")), ",").alias(
            "q_csv"
        ),
        F.aggregate("q", F.lit(0).cast("long"), lambda a, x: a + x).alias("sum_q"),
        F.size(F.filter("q", lambda x: F.abs(x) == F.lit(127))).cast("long").alias(
            "n_sat"
        ),
    )


_QUANT_ORACLE = f"""WITH withm AS (
    SELECT vec_id, embedding AS v,
           list_reduce([CAST(0.0 AS DOUBLE)] ||
               list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
               (acc, x) -> greatest(acc, x)) AS maxabs
    FROM embeddings
),
withq AS (
    SELECT vec_id, maxabs,
           list_transform(v, x -> CASE WHEN maxabs = 0.0 THEN CAST(0 AS BIGINT)
               ELSE CAST(floor(CAST(x AS DOUBLE) * {Q_MAX} / maxabs + 0.5) AS BIGINT)
           END) AS q
    FROM withm
)
SELECT vec_id, maxabs, array_to_string(q, ',') AS q_csv,
       list_reduce([CAST(0 AS BIGINT)] || q, (a, x) -> a + x) AS sum_q,
       CAST(len(list_filter(q, x -> abs(x) = 127)) AS BIGINT) AS n_sat
FROM withq"""

register("embedding_quantize_int8", _q_quantize, _QUANT_ORACLE)


# ---------------------------------------------------------------------------
# Normalized-text dedup

_NORM_STRIP = "[^a-z0-9 ]"
_WS = "[ ]+"


def _q_norm_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup on the NORMALIZED content hash: lowercase → strip
    non-alphanumerics → collapse runs of spaces → trim. Catches
    recapitalized / repunctuated copies exact dedup misses. The
    character class is shared ASCII regex semantics in Java and DuckDB
    RE2. Same scale shape as exact dedup: one shuffle on md5(norm)."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), _NORM_STRIP, ""), _WS, " "
        )
    )
    keyed = d.select("doc_id", F.md5(norm).alias("norm_md5"))
    return keyed.groupBy("norm_md5").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )


_NORM_ORACLE = f"""WITH keyed AS (
    SELECT doc_id,
           md5(trim(regexp_replace(
               regexp_replace(lower(text), '{_NORM_STRIP}', '', 'g'),
               '{_WS}', ' ', 'g'))) AS norm_md5
    FROM documents
)
SELECT norm_md5, min(doc_id) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_docs
FROM keyed GROUP BY norm_md5"""

register("text_normalize_dedup", _q_norm_dedup, _NORM_ORACLE)
