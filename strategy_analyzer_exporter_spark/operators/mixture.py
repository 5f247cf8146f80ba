"""Domain-mixture planning over ``documents`` (LLM-pipeline surface).

A pre-training data build assigns each source/domain a target weight,
then computes per-source sampling rates against the available token
counts (upsample scarce high-weight domains, downsample abundant
low-weight ones) — the planning step behind every "data mixture" table
in an LLM paper. This operator produces that plan:

- available tokens per source (exact integer sums of per-doc token
  counts);
- deterministic integer target weights (w = 20 − source index — stands
  in for the human-chosen mixture; integer so the normalizing sum is
  exact);
- target tokens  = floor(budget · w / Σw)   (budget = half the corpus);
- sampling_rate  = min(1, target/available) and the raw ratio (> 1 ⇒
  the domain must be oversampled / repeated across epochs).

All derived doubles are single correctly-rounded divisions of exact
integers (< 2^53), so the plan matches the DuckDB oracle bit-for-bit.
Plan shape: one explode-free scan (token counts from the tokenizer
split length), one hash aggregation on source, then a 20-row
broadcast of the totals — nothing here grows with corpus size except
the first aggregation, which has map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strategy_analyzer_exporter_spark.functions import TOKENS_SQL as _TOKENS_SQL
from strategy_analyzer_exporter_spark.functions import tokens as _tokens
from strategy_analyzer_exporter_spark.registry import register
from strategy_analyzer_exporter_spark.sources.tables import load_table

MIX_BUDGET_FRAC_DEN = 2  # token budget = total // 2


def _q_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        F.size(_tokens(F.col("text"))).cast("long").alias("n_tok"),
    )
    per_src = (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("available_tokens"),
        )
        .withColumn(
            "weight", F.lit(20) - F.substring("source", 4, 10).cast("long")
        )
    )
    # weight is a pure function of the source key; attach totals
    totals = per_src.agg(
        F.sum("weight").alias("total_w"),
        F.sum("available_tokens").alias("total_tokens"),
    )
    j = per_src.crossJoin(F.broadcast(totals))
    budget = F.floor(F.col("total_tokens") / MIX_BUDGET_FRAC_DEN).cast("long")
    target = F.floor(
        (budget * F.col("weight")).cast("double") / F.col("total_w").cast("double")
    ).cast("long")
    raw_ratio = target.cast("double") / F.col("available_tokens").cast("double")
    return j.select(
        "source",
        "n_docs",
        "available_tokens",
        "weight",
        target.alias("target_tokens"),
        F.least(F.lit(1.0), raw_ratio).alias("sampling_rate"),
        raw_ratio.alias("raw_ratio"),
        (raw_ratio > 1.0).alias("needs_oversampling"),
    )


_MIXTURE_ORACLE = f"""WITH d AS (
    SELECT source, CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tok FROM documents
),
per_src AS (
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS available_tokens,
           20 - CAST(substring(source, 4, 10) AS BIGINT) AS weight
    FROM d GROUP BY source
),
totals AS (
    SELECT CAST(sum(weight) AS BIGINT) AS total_w,
           CAST(sum(available_tokens) AS BIGINT) AS total_tokens
    FROM per_src
),
j AS (
    SELECT p.*, t.total_w, t.total_tokens,
           CAST(floor(CAST(floor(t.total_tokens / {MIX_BUDGET_FRAC_DEN}) AS BIGINT)
                      * p.weight / t.total_w) AS BIGINT) AS target_tokens
    FROM per_src p CROSS JOIN totals t
)
SELECT source, n_docs, available_tokens, weight, target_tokens,
       least(1.0, CAST(target_tokens AS DOUBLE) / CAST(available_tokens AS DOUBLE))
           AS sampling_rate,
       CAST(target_tokens AS DOUBLE) / CAST(available_tokens AS DOUBLE) AS raw_ratio,
       CAST(target_tokens AS DOUBLE) / CAST(available_tokens AS DOUBLE) > 1.0
           AS needs_oversampling
FROM j"""


register("domain_mixture_plan", _q_domain_mixture, _MIXTURE_ORACLE)


# ---------------------------------------------------------------------------
# Temperature-scaled source mixture (the multilingual-sampling rule of
# Lample & Conneau 2019 / XLM §3.1, mT5's α-sampling): instead of
# human-chosen weights, each source's sampling weight is its share
# raised to a temperature, w_i = n_i^α with α = 0.5 — upweighting
# scarce sources and flattening dominant ones. α is pinned at 0.5
# because n^0.5 = sqrt(n) is an IEEE correctly-rounded primitive in
# BOTH engines, while pow(x, α) for general α is not (the house ln/pow
# rule) — the one α where temperature sampling is bit-deterministic
# cross-engine.
#
# The operator emits the PLAN and the ENACTED sample in one relation:
# per source — available docs, weight, normalized fraction (the Σw fold
# runs over the source-sorted weight list in both engines, so the
# double sum is order-pinned), the doc budget's floor target, the
# capped sampling rate, the 16-bit hash-bucket threshold implementing
# that rate, and the count ACTUALLY selected by the deterministic
# md5-bucket predicate (the achieved count differs from target_k by
# bucket granularity — reporting both is the point: the plan is what
# you asked for, the selection is what the idempotent hash filter
# yields).
#
# 100 TB shape: two corpus passes, irreducibly — the rate depends on
# the per-source counts, so pass 1 is one hash-agg on source (~20
# groups, map-side partials), pass 2 re-scans with the ≤20-row plan
# BROADCAST joined on source and the bucket predicate applied map-side
# (the per-doc md5 never shuffles; only the per-source selected counts
# do). Membership is positional-state-free: a document's fate depends
# only on (doc_id, its source's rate), so re-running over an updated
# crawl keeps every surviving source-rate pair's members stable.

TEMP_BUDGET_DEN = 2  # doc budget = total // 2
TEMP_SALT = "tmix"


def _q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    per_src = (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("w", F.sqrt(F.col("n_docs").cast("double")))
    )
    totals = per_src.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("source", "w"))),
                lambda s: s["w"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("sum_w"),
        F.sum("n_docs").alias("total_docs"),
    )
    j = per_src.crossJoin(F.broadcast(totals))
    budget = F.floor(F.col("total_docs") / TEMP_BUDGET_DEN).cast("long")
    frac = F.col("w") / F.col("sum_w")
    target = F.floor(budget.cast("double") * frac).cast("long")
    rate = F.least(
        F.lit(1.0), target.cast("double") / F.col("n_docs").cast("double")
    )
    plan = j.select(
        "source",
        "n_docs",
        F.col("w").alias("weight"),
        frac.alias("frac"),
        target.alias("target_k"),
        rate.alias("rate"),
        F.floor(rate * F.lit(65536.0)).cast("long").alias("bucket_thr"),
    )
    bucket_int = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(TEMP_SALT + ":"), F.col("doc_id").cast("string"))),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    sel = (
        d.join(F.broadcast(plan.select("source", "bucket_thr")), "source")
        .filter(bucket_int < F.col("bucket_thr"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_selected"))
    )
    return (
        plan.join(sel, "source", "left")
        .withColumn("n_selected", F.coalesce("n_selected", F.lit(0)))
    )


_TEMP_MIX_ORACLE = f"""WITH d AS (
    SELECT doc_id, source FROM documents
),
per_src AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           sqrt(CAST(count(*) AS DOUBLE)) AS w
    FROM d GROUP BY source
),
totals AS (
    SELECT list_reduce([CAST(0.0 AS DOUBLE)] || list(w ORDER BY source),
                       (a, x) -> a + x) AS sum_w,
           CAST(sum(n_docs) AS BIGINT) AS total_docs
    FROM per_src
),
plan AS (
    SELECT p.source, p.n_docs, p.w AS weight, p.w / t.sum_w AS frac,
           CAST(floor(CAST(CAST(floor(t.total_docs / {TEMP_BUDGET_DEN}) AS BIGINT)
                           AS DOUBLE) * (p.w / t.sum_w)) AS BIGINT) AS target_k
    FROM per_src p CROSS JOIN totals t
),
plan2 AS (
    SELECT *,
           least(1.0, CAST(target_k AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS rate,
           CAST(floor(least(1.0, CAST(target_k AS DOUBLE)
                                 / CAST(n_docs AS DOUBLE)) * 65536.0) AS BIGINT)
               AS bucket_thr
    FROM plan
),
sel AS (
    SELECT d.source, CAST(count(*) AS BIGINT) AS n_selected
    FROM d JOIN plan2 p USING (source)
    WHERE CAST(concat('0x', substr(md5('{TEMP_SALT}:' || CAST(doc_id AS VARCHAR)),
                                   1, 4)) AS BIGINT) < p.bucket_thr
    GROUP BY d.source
)
SELECT p.source, p.n_docs, p.weight, p.frac, p.target_k, p.rate, p.bucket_thr,
       COALESCE(s.n_selected, 0) AS n_selected
FROM plan2 p LEFT JOIN sel s USING (source)"""


register("sample_temperature_mixture", _q_temperature_mixture, _TEMP_MIX_ORACLE)
