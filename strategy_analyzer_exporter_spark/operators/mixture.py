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
