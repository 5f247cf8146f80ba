"""Near-duplicate detection operators over ``documents`` (LLM-pipeline
surface, BASELINE.json north_star).

All hashing is md5-based so the Spark and DuckDB implementations produce
identical values; MinHash signatures compare *hex strings* (any total
order works for min-hashing, and lexicographic order on hex is identical
in both engines — no integer conversion needed).

Scale design (100 TB): every algorithm here is banded LSH — candidate
pairs come from an equi-join on small band keys, never from an all-pairs
product. The expensive exact verification (Jaccard / Hamming) runs only
on candidates. Hot buckets (boilerplate shingles) are the classic skew
source: AQE skew-join handles moderate skew, and the band keys can be
salted by doc-length bucket if needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from strategy_analyzer_exporter_spark.registry import register
from strategy_analyzer_exporter_spark.sources.tables import load_table

# MinHash parameters: 12 hashes in 4 bands × 3 rows; word-3-gram shingles.
NUM_HASHES = 12
NUM_BANDS = 4
ROWS_PER_BAND = 3
SHINGLE_K = 3
JACCARD_THRESHOLD = 0.5

# SimHash parameters: 64-bit fingerprint, 4 bands × 16 bits, Hamming ≤ 6.
SIMHASH_BITS = 64
SIMHASH_BANDS = 4
HAMMING_THRESHOLD = 6


def _tokens(text: Column) -> Column:
    """Whitespace tokens, empties dropped. The corpus is single-space
    separated lowercase words, and both engines split identically."""
    return F.filter(F.split(text, " "), lambda t: t != "")


_TOKENS_SQL = "list_filter(string_split(text, ' '), t -> t <> '')"


def _shingles(tokens: Column, k: int = SHINGLE_K) -> Column:
    """Distinct word-k-gram shingle strings."""
    n = F.size(tokens)
    grams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + j) for j in range(k)]
        ),
    )
    return F.array_distinct(grams)


def _shingles_sql(tokens: str, k: int = SHINGLE_K) -> str:
    parts = " || ' ' || ".join(f"({tokens})[i+{j}]" for j in range(k))
    return (
        f"list_distinct(list_transform(range(1, len({tokens}) - {k - 2}), "
        f"i -> {parts}))"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH


def _q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs: shingle → 12 seeded md5 min-hashes →
    4 band keys → equi-join on band key → exact Jaccard ≥ 0.5 verify.

    Candidate generation is one shuffle on the band key (size ≈ docs ×
    bands), so no all-pairs comparison ever materializes."""
    d = load_table(spark, sf_dir, "documents")
    sh = _shingles(_tokens(F.col("text")))
    docs = (
        d.select("doc_id", sh.alias("sh"))
        .filter(F.size("sh") >= 1)
    )
    mh = [
        F.array_min(
            F.transform(F.col("sh"), lambda s, j=j: F.md5(F.concat(F.lit(f"{j}:"), s)))
        ).alias(f"mh{j}")
        for j in range(NUM_HASHES)
    ]
    sigs = docs.select("doc_id", "sh", *mh)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat(
                    *[F.col(f"mh{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
                ).alias("key"),
            )
            for b in range(NUM_BANDS)
        ]
    )
    bands = sigs.select(
        "doc_id", "sh", F.explode(band_structs).alias("bk")
    ).select("doc_id", "sh", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    jac = (
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b")).cast("double")
    )
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


def _minhash_oracle() -> str:
    mh_cols = ",\n           ".join(
        f"list_min(list_transform(sh, s -> md5('{j}:' || s))) AS mh{j}"
        for j in range(NUM_HASHES)
    )
    band_selects = "\n    UNION ALL\n    ".join(
        "SELECT doc_id, sh, {b} AS band, mh{h0} || mh{h1} || mh{h2} AS key FROM sigs".format(
            b=b,
            h0=b * ROWS_PER_BAND,
            h1=b * ROWS_PER_BAND + 1,
            h2=b * ROWS_PER_BAND + 2,
        )
        for b in range(NUM_BANDS)
    )
    return f"""WITH toks AS (
    SELECT doc_id, {_TOKENS_SQL} AS t FROM documents
),
sh AS (
    SELECT doc_id, {_shingles_sql('t')} AS sh FROM toks WHERE len(t) >= {SHINGLE_K}
),
sigs AS (
    SELECT doc_id, sh,
           {mh_cols}
    FROM sh WHERE len(sh) >= 1
),
bands AS (
    {band_selects}
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
scored AS (
    SELECT c.doc_a, c.doc_b,
           CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
             / CAST(len(list_distinct(sa.sh || sb.sh)) AS DOUBLE) AS jaccard
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.doc_a
    JOIN sh sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= {JACCARD_THRESHOLD}"""


# ---------------------------------------------------------------------------
# N-gram Jaccard (exact, inverted-index candidates)


def _q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard dedup with inverted-index candidate
    generation: docs sharing at least one 5-gram are candidates (join on
    the gram itself), then exact Jaccard ≥ 0.6 verify. Compared to
    MinHash this has no false negatives; the candidate join is bigger, so
    it suits high-threshold dedup where shared long grams are rare."""
    d = load_table(spark, sf_dir, "documents")
    sh = _shingles(_tokens(F.col("text")), k=5)
    docs = d.select("doc_id", sh.alias("sh")).filter(F.size("sh") >= 1)
    inv = docs.select("doc_id", "sh", F.explode("sh").alias("gram"))
    a, b = inv.alias("a"), inv.alias("b")
    cand = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    jac = (
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b")).cast("double")
    )
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.6)
        .select("doc_a", "doc_b", "jaccard")
    )


_NGRAM_ORACLE = f"""WITH toks AS (
    SELECT doc_id, {_TOKENS_SQL} AS t FROM documents
),
sh AS (
    SELECT doc_id, {_shingles_sql('t', 5)} AS sh FROM toks WHERE len(t) >= 5
),
inv AS (
    SELECT doc_id, unnest(sh) AS gram FROM sh
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
),
scored AS (
    SELECT c.doc_a, c.doc_b,
           CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
             / CAST(len(list_distinct(sa.sh || sb.sh)) AS DOUBLE) AS jaccard
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.doc_a
    JOIN sh sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= 0.6"""


# ---------------------------------------------------------------------------
# SimHash


def _simhash(tokens: Column) -> Column:
    """64-bit SimHash as a '0'/'1' string: per token, md5's first 16 hex
    chars are its 64 feature bits; each bit position votes ±1; the sign
    of the vote is the fingerprint bit. Integer votes are order-
    independent, so engine-native sums would also work — folds keep the
    implementation uniform."""
    hexes = F.transform(tokens, lambda t: F.substring(F.md5(t), 1, 16))

    def bit_char(p: Column) -> Column:
        # floor() then cast: DuckDB's CAST(double AS INTEGER) *rounds*
        # while Spark's truncates — floor makes both exact
        digit_idx = F.floor(p / 4).cast("int") + 1  # 1-based hex char
        mask = (
            F.when(p % 4 == 0, 8)
            .when(p % 4 == 1, 4)
            .when(p % 4 == 2, 2)
            .otherwise(1)
        )
        vote = F.aggregate(
            hexes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(
                (
                    F.instr(F.lit("0123456789abcdef"), F.substring(h, digit_idx, 1))
                    - 1
                ).bitwiseAND(mask)
                != 0,
                F.lit(1),
            ).otherwise(F.lit(-1)),
        )
        return F.when(vote > 0, F.lit("1")).otherwise(F.lit("0"))

    return F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)), bit_char), ""
    )


def _simhash_sql(tokens: str) -> str:
    hexes = f"list_transform({tokens}, t -> substring(md5(t), 1, 16))"
    vote = (
        f"list_reduce([0] || list_transform({hexes}, h -> "
        f"CASE WHEN ((strpos('0123456789abcdef', substring(h, CAST(floor(p/4) AS INTEGER) + 1, 1)) - 1) "
        f"& (CASE WHEN p%4=0 THEN 8 WHEN p%4=1 THEN 4 WHEN p%4=2 THEN 2 ELSE 1 END)) <> 0 "
        f"THEN 1 ELSE -1 END), (acc, x) -> acc + x)"
    )
    return (
        f"array_to_string(list_transform(range(0, {SIMHASH_BITS}), "
        f"p -> CASE WHEN {vote} > 0 THEN '1' ELSE '0' END), '')"
    )


def _q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 64-bit fingerprints, banded into 4×16-bit
    keys, exact Hamming ≤ 6 verify on band-collision candidates. By
    pigeonhole, recall is guaranteed for pairs with Hamming ≤ 3; pairs at
    4-6 are kept when they happen to collide on a band (standard banded
    SimHash trade-off — more bands for more recall)."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", _simhash(_tokens(F.col("text"))).alias("sim")
    )
    band_w = SIMHASH_BITS // SIMHASH_BANDS
    bands = docs.select(
        "doc_id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.substring("sim", 1 + b * band_w, band_w).alias("key"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "sim", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sim").alias("sim_a"),
            F.col("b.sim").alias("sim_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.aggregate(
        F.sequence(F.lit(1), F.lit(SIMHASH_BITS)),
        F.lit(0),
        lambda acc, p: acc
        + F.when(
            F.substring(F.col("sim_a"), p, 1) != F.substring(F.col("sim_b"), p, 1),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return (
        cand.withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= HAMMING_THRESHOLD)
        .select("doc_a", "doc_b", "hamming")
    )


def _simhash_oracle() -> str:
    band_w = SIMHASH_BITS // SIMHASH_BANDS
    band_selects = "\n    UNION ALL\n    ".join(
        f"SELECT doc_id, sim, {b} AS band, substring(sim, {1 + b * band_w}, {band_w}) AS key FROM sims"
        for b in range(SIMHASH_BANDS)
    )
    return f"""WITH toks AS (
    SELECT doc_id, {_TOKENS_SQL} AS t FROM documents
),
sims AS (
    SELECT doc_id, {_simhash_sql('t')} AS sim FROM toks
),
bands AS (
    {band_selects}
),
cand AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           min(a.sim) AS sim_a, min(b.sim) AS sim_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
scored AS (
    SELECT doc_a, doc_b,
           CAST(list_reduce([0] || list_transform(range(1, {SIMHASH_BITS + 1}),
                p -> CASE WHEN substring(sim_a, p, 1) <> substring(sim_b, p, 1) THEN 1 ELSE 0 END),
                (acc, x) -> acc + x) AS BIGINT) AS hamming
    FROM cand
)
SELECT doc_a, doc_b, hamming FROM scored WHERE hamming <= {HAMMING_THRESHOLD}"""


register("dedup_minhash_lsh", _q_dedup_minhash, _minhash_oracle())
register("dedup_ngram_jaccard", _q_dedup_ngram, _NGRAM_ORACLE)
register("dedup_simhash", _q_dedup_simhash, _simhash_oracle())
