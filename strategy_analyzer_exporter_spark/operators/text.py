"""Text-analysis operators over ``documents`` (LLM-pipeline surface).

Execution strategy: tokenize by exploding to ROWS and aggregate with
groupBy — never per-row array higher-order functions. Array lambdas
(``F.aggregate``/``F.transform``) are interpreted expressions that never
enter whole-stage codegen; at sf0.1 the old fold-based quality scorer
alone cost 11 s (59 % of the whole bench). The explode + hash-aggregate
form is all codegen'd built-ins, partial-aggregates map-side, and is the
shape that scales: a 100 TB corpus becomes a token-row relation that
shuffles once on doc_id with map-side combine, exactly like the SimHash
vote pipeline (dedup.py).

All counts are exact integers aggregated order-independently, and every
ratio divides those counts as doubles, so both engines produce identical
floats (the DuckDB oracles still use list folds — integer sums agree
regardless of order).

Zero-token documents are preserved via ``explode_outer`` (one null-token
row): counts coalesce to 0 and ratios become NULL in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from strategy_analyzer_exporter_spark.registry import register
from strategy_analyzer_exporter_spark.sources.tables import load_table

from strategy_analyzer_exporter_spark.functions import TOKENS_SQL as _TOKENS_SQL
from strategy_analyzer_exporter_spark.functions import tokens as _tokens

# tiny per-language stopword lists for the n-gram/stopword heuristic;
# langs ordered by priority for deterministic argmax tie-breaks
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "fr": ("le", "la", "les", "et", "est", "un"),
    "es": ("el", "la", "los", "y", "es", "un"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}

EN_STOPWORDS = LANG_STOPWORDS["en"]


def _tok_rows(d: DataFrame, *carry: str) -> DataFrame:
    """(carry..., tok) rows — one row per token occurrence, plus one
    null-token row for zero-token docs (explode_outer) so no document
    drops out of the downstream groupBy."""
    return d.select(
        *carry,
        F.explode_outer(_tokens(F.col("text"))).alias("tok"),
    )


def _stop_hits(words: tuple[str, ...]) -> Column:
    """Per-occurrence stopword indicator summed per group — the row form
    of the old array fold (multiset count). NULL token (empty doc) and
    non-members both contribute 0."""
    return F.sum(F.when(F.col("tok").isin(*words), 1).otherwise(0))


def _count_in_set_sql(tokens: str, words: tuple[str, ...]) -> str:
    lit = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return (
        f"list_reduce([0] || list_transform({tokens}, "
        f"t -> CASE WHEN list_contains({lit}, t) THEN 1 ELSE 0 END), (acc, x) -> acc + x)"
    )


# ---------------------------------------------------------------------------
# Token statistics


def _q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    rows = _tok_rows(
        d.withColumn("n_chars_measured", F.length("text").cast("long")),
        "doc_id",
        "lang",
        "n_chars_measured",
    )
    # count()/count_distinct() ignore the null token of empty docs, so
    # n_tokens is 0 there and the ratios 0/0 → NULL in both engines
    agg = rows.groupBy("doc_id", "lang", "n_chars_measured").agg(
        F.count("tok").alias("n_tokens"),
        F.count_distinct("tok").alias("n_distinct_tokens"),
        F.sum(F.length("tok")).alias("_tok_chars"),
    )
    n = F.col("n_tokens").cast("double")
    return agg.select(
        "doc_id",
        "lang",
        "n_chars_measured",
        "n_tokens",
        "n_distinct_tokens",
        (F.col("_tok_chars").cast("double") / n).alias("avg_token_len"),
        (F.col("n_distinct_tokens").cast("double") / n).alias("type_token_ratio"),
    )


_TOKEN_STATS_ORACLE = f"""WITH toks AS (
    SELECT doc_id, lang, text, {_TOKENS_SQL} AS t FROM documents
)
SELECT doc_id, lang,
       CAST(length(text) AS BIGINT) AS n_chars_measured,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct_tokens,
       CAST(list_reduce([0] || list_transform(t, x -> CAST(length(x) AS INTEGER)), (acc, x) -> acc + x) AS DOUBLE)
         / CAST(len(t) AS DOUBLE) AS avg_token_len,
       CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS type_token_ratio
FROM toks"""


# ---------------------------------------------------------------------------
# Quality scoring


def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: longer docs, richer vocabulary, and a
    moderate stopword ratio score higher. Weights are arbitrary but fixed;
    every term is an exact count ratio so the score is reproducible."""
    d = load_table(spark, sf_dir, "documents")
    rows = _tok_rows(d, "doc_id", "lang")
    agg = rows.groupBy("doc_id", "lang").agg(
        F.count("tok").alias("n_tokens"),
        F.count_distinct("tok").alias("_dist"),
        _stop_hits(EN_STOPWORDS).alias("_stop"),
    )
    n = F.col("n_tokens").cast("double")
    stop_ratio = F.col("_stop").cast("double") / n
    distinct_ratio = F.col("_dist").cast("double") / n
    length_score = F.least(n / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.4) * length_score
        + F.lit(0.4) * distinct_ratio
        + F.lit(0.2) * stop_ratio
    )
    return agg.select(
        "doc_id",
        "lang",
        "n_tokens",
        stop_ratio.alias("stopword_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        score.alias("quality_score"),
    )


_QUALITY_ORACLE = f"""WITH toks AS (
    SELECT doc_id, lang, {_TOKENS_SQL} AS t FROM documents
),
m AS (
    SELECT doc_id, lang,
           CAST(len(t) AS DOUBLE) AS n,
           CAST({_count_in_set_sql('t', EN_STOPWORDS)} AS DOUBLE) AS stop,
           CAST(len(list_distinct(t)) AS DOUBLE) AS dist
    FROM toks
)
SELECT doc_id, lang,
       CAST(n AS BIGINT) AS n_tokens,
       stop / n AS stopword_ratio,
       dist / n AS distinct_ratio,
       0.4 * least(n / 100.0, 1.0) + 0.4 * (dist / n) + 0.2 * (stop / n) AS quality_score
FROM m"""


# ---------------------------------------------------------------------------
# Language identification (stopword-hit heuristic)


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language ID: score each language by stopword hits
    (one conditional sum per language over the token rows — a single
    hash aggregate), predict the max (ties broken by fixed language
    priority). The corpus text is synthetic, so agreement with the
    `lang` label is reported, not asserted."""
    d = load_table(spark, sf_dir, "documents")
    rows = _tok_rows(d, "doc_id", "lang")
    langs = list(LANG_STOPWORDS)
    scored = rows.groupBy("doc_id", "lang").agg(
        *[
            _stop_hits(LANG_STOPWORDS[lang]).cast("long").alias(f"s_{lang}")
            for lang in langs
        ]
    )
    expr = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = F.col(f"s_{lang}") >= F.col(f"s_{other}") if langs.index(other) > langs.index(lang) else F.col(f"s_{lang}") > F.col(f"s_{other}")
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    predicted = expr.otherwise(F.lit(langs[0]))
    return scored.select(
        "doc_id",
        "lang",
        *[f"s_{lang}" for lang in langs],
        predicted.alias("predicted_lang"),
        (predicted == F.col("lang")).alias("matches_label"),
    )


def _lang_id_oracle() -> str:
    langs = list(LANG_STOPWORDS)
    score_cols = ",\n           ".join(
        f"CAST({_count_in_set_sql('t', LANG_STOPWORDS[lang])} AS BIGINT) AS s_{lang}"
        for lang in langs
    )
    whens = []
    for lang in langs:
        conds = []
        for other in langs:
            if other == lang:
                continue
            op = ">=" if langs.index(other) > langs.index(lang) else ">"
            conds.append(f"s_{lang} {op} s_{other}")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(whens) + f" ELSE '{langs[0]}' END"
    return f"""WITH toks AS (
    SELECT doc_id, lang, {_TOKENS_SQL} AS t FROM documents
),
scored AS (
    SELECT doc_id, lang,
           {score_cols}
    FROM toks
)
SELECT doc_id, lang, {', '.join('s_' + lang for lang in langs)},
       {case} AS predicted_lang,
       ({case}) = lang AS matches_label
FROM scored"""


# ---------------------------------------------------------------------------
# Document fingerprinting


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two content fingerprints per doc:
    - bag_fingerprint: md5 of the sorted distinct token list — invariant
      to word order and repetition (fast near-dup blocking key).
    - winnow_fingerprint: min md5 over word-5-gram shingles — a 1-hash
      MinHash, stable under small edits away from the minimizing gram.

    Row form: 5-grams come from ``lead(tok, j)`` over a per-doc window
    (one sort on doc_id), md5 + min aggregate JVM-side; ``F.concat``
    (null if ANY operand is null) nulls out the tail positions where the
    gram would be short, and min() ignores them — so docs with < 5
    tokens get a NULL winnow fingerprint, same as the oracle's empty
    ``range()``. min over duplicate grams equals min over distinct."""
    d = load_table(spark, sf_dir, "documents")
    rows = d.select(
        "doc_id",
        F.posexplode_outer(_tokens(F.col("text"))).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    gram = F.concat(
        F.col("tok"),
        F.lit(" "),
        F.lead("tok", 1).over(w),
        F.lit(" "),
        F.lead("tok", 2).over(w),
        F.lit(" "),
        F.lead("tok", 3).over(w),
        F.lit(" "),
        F.lead("tok", 4).over(w),
    )
    return (
        rows.withColumn("_gram_md5", F.md5(gram))
        .groupBy("doc_id")
        .agg(
            F.md5(F.array_join(F.array_sort(F.collect_set("tok")), " ")).alias(
                "bag_fingerprint"
            ),
            F.min("_gram_md5").alias("winnow_fingerprint"),
        )
    )


_FINGERPRINT_ORACLE = f"""WITH toks AS (
    SELECT doc_id, {_TOKENS_SQL} AS t FROM documents
)
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS bag_fingerprint,
       list_min(list_transform(
           list_distinct(list_transform(range(1, len(t) - 3),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])),
           g -> md5(g))) AS winnow_fingerprint
FROM toks"""


register("text_token_stats", _q_token_stats, _TOKEN_STATS_ORACLE)
register("text_quality_score", _q_quality, _QUALITY_ORACLE)
register("text_lang_id", _q_lang_id, _lang_id_oracle())
register("text_fingerprint", _q_fingerprint, _FINGERPRINT_ORACLE)
