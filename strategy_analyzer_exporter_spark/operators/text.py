"""Text-analysis operators over ``documents`` (LLM-pipeline surface).

All pure column expressions (codegen'd JVM-side, no UDFs): token
statistics, quality scoring, n-gram-heuristic language ID, and document
fingerprinting. Ratios divide exact integer counts as doubles, so both
engines produce identical floats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
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


def _count_in_set(tokens: Column, words: tuple[str, ...]) -> Column:
    """#tokens that are in the word set (multiset count, left-fold)."""
    wset = F.array(*[F.lit(w) for w in words])
    return F.aggregate(
        tokens,
        F.lit(0),
        lambda acc, t: acc + F.when(F.array_contains(wset, t), 1).otherwise(0),
    )


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
    toks = _tokens(F.col("text"))
    tok_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return d.select(
        "doc_id",
        "lang",
        F.length("text").cast("long").alias("n_chars_measured"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        (tok_chars.cast("double") / F.size(toks).cast("double")).alias("avg_token_len"),
        (
            F.size(F.array_distinct(toks)).cast("double")
            / F.size(toks).cast("double")
        ).alias("type_token_ratio"),
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
    toks = _tokens(F.col("text"))
    n = F.size(toks).cast("double")
    stop = _count_in_set(toks, EN_STOPWORDS).cast("double")
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n
    stop_ratio = stop / n
    length_score = F.least(n / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.4) * length_score
        + F.lit(0.4) * distinct_ratio
        + F.lit(0.2) * stop_ratio
    )
    return d.select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_tokens"),
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
    """Stopword-ratio language ID: score each language by stopword hits,
    predict the max (ties broken by fixed language priority). The corpus
    text is synthetic, so agreement with the `lang` label is reported,
    not asserted."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    scores = {
        lang: _count_in_set(toks, words).alias(f"s_{lang}")
        for lang, words in LANG_STOPWORDS.items()
    }
    scored = d.select("doc_id", "lang", *scores.values())
    langs = list(LANG_STOPWORDS)
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
        *[F.col(f"s_{lang}").cast("long").alias(f"s_{lang}") for lang in langs],
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
      MinHash, stable under small edits away from the minimizing gram."""
    from strategy_analyzer_exporter_spark.operators.dedup import _shingles

    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    bag = F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))
    grams = _shingles(toks, k=5)
    winnow = F.array_min(F.transform(grams, lambda g: F.md5(g)))
    return d.select(
        "doc_id",
        bag.alias("bag_fingerprint"),
        winnow.alias("winnow_fingerprint"),
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
