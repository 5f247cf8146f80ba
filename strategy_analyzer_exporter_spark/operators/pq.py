"""Product-quantization ANN (the IVF-PQ scale path; Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011).

Brute-force cosine touches every raw vector per query — fine streamed,
but at 100 TB the index you actually build is PQ: split each vector
into M subvectors, k-means each subspace into a tiny codebook, store
each vector as M small codes, and answer queries via ADC (asymmetric
distance computation) — a per-query lookup TABLE of query-to-centroid
distances, so scoring a candidate is M table lookups + adds, touching
no raw vectors at all.

Here: M=4 subspaces × 16 dims, K=16 centroids per subspace (one exact
Lloyd round from a deterministic init — same recipe as
pipeline._q_kmeans), codes + ADC join fully in DataFrame ops. The
codebooks and lookup tables are k×M rows — always broadcast; the only
per-candidate work is 4 broadcast-hash-join probes and 3 additions.

Float parity: subspace distances use the pinned-fold sqdist
(functions/vector.py — arrow and fold paths bit-identical), centroid
means are decimal-staged ``davg`` (order-independent), and the ADC sum
is a fixed left-associated chain — so the approximate distances, and
therefore the result rows, match the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from strategy_analyzer_exporter_spark.functions import davg_sql
from strategy_analyzer_exporter_spark.functions.topk import ranked_init
from strategy_analyzer_exporter_spark.registry import register
from strategy_analyzer_exporter_spark.sources.tables import load_table

PQ_M = 4  # subspaces
PQ_SUBDIM = 16  # dims per subspace (4 × 16 = 64)
PQ_K = 16  # centroids per subspace
PQ_TOPK = 3
N_QUERIES = 10


def _sqdist_sql(a: str, b: str, dim: int) -> str:
    return (
        f"list_reduce([CAST(0.0 AS DOUBLE)] || "
        f"list_transform(range(1, {dim} + 1), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (acc, x) -> acc + x)"
    )


def _subspace(emb: DataFrame, m: int) -> DataFrame:
    return emb.select(
        "vec_id",
        F.slice(F.col("embedding"), m * PQ_SUBDIM + 1, PQ_SUBDIM)
        .cast("array<double>")
        .alias("v"),
    )


def _codebook(sub: DataFrame) -> DataFrame:
    """One exact Lloyd round from the deterministic init (the PQ_K
    lowest-vec_id subvectors) — k×subdim rows, eagerly materialized."""
    # function-level import: operator modules must stay standalone-
    # importable (no register-time sibling imports — see
    # test_operator_modules_import_standalone)
    from strategy_analyzer_exporter_spark.operators.pipeline import (
        kmeans_assign,
        kmeans_update,
    )

    c0 = ranked_init(sub, "vec_id", PQ_K, "cid").select(
        "cid", F.col("v").alias("cv")
    )
    assigned = kmeans_assign(sub, c0).select("vec_id", "cid")
    return kmeans_update(assigned, sub).localCheckpoint()


# The index (per-subspace codebooks + per-vector codes) is built once
# per (session, corpus, kernel) and memoized — a PQ index is
# constructed once and queried many times; repeated query builds must
# pay the ~20-job Lloyd/encode cost only the first time. Checkpointed
# DataFrames stay valid for the life of the Spark application.
_INDEX_CACHE: dict = {}


def _pq_index(spark: SparkSession, sf_dir: str):
    from strategy_analyzer_exporter_spark.functions import vector
    from strategy_analyzer_exporter_spark.operators.pipeline import kmeans_assign

    key = (spark.sparkContext.applicationId, sf_dir, vector.kernel())
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    emb = load_table(spark, sf_dir, "embeddings")
    codes = None
    cbs = []
    for m in range(PQ_M):
        sub = _subspace(emb, m)
        cb = _codebook(sub)
        cbs.append(cb)
        code_m = kmeans_assign(sub, cb).select(
            "vec_id", F.col("cid").alias(f"code{m}")
        )
        codes = code_m if codes is None else codes.join(code_m, "vec_id")
    codes = codes.localCheckpoint()
    _INDEX_CACHE[key] = (codes, cbs)
    return codes, cbs


def _q_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strategy_analyzer_exporter_spark.functions import vector

    emb = load_table(spark, sf_dir, "embeddings")
    codes, cbs = _pq_index(spark, sf_dir)
    qds = []
    for m in range(PQ_M):
        sub = _subspace(emb, m)
        q_sub = sub.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        qds.append(
            q_sub.crossJoin(F.broadcast(cbs[m])).select(
                "query_id",
                F.col("cid").alias(f"qcid{m}"),
                vector.sqdist(F.col("qv"), F.col("cv")).alias(f"qd{m}"),
            )
        )
    cand = codes.withColumnRenamed("vec_id", "cand_id")
    scored = cand
    for m in range(PQ_M):
        on = [scored[f"code{m}"] == qds[m][f"qcid{m}"]]
        if m > 0:
            on.append(scored["query_id"] == qds[m]["query_id"])
        scored = scored.join(F.broadcast(qds[m]), on).drop(f"qcid{m}")
        if m > 0:
            scored = scored.drop(qds[m]["query_id"])
    adc = (
        F.col("qd0") + F.col("qd1") + F.col("qd2") + F.col("qd3")
    ).alias("adc_dist")
    scored = scored.filter(F.col("cand_id") != F.col("query_id")).select(
        "query_id", "cand_id", adc
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist"), F.col("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= PQ_TOPK)
        .select("query_id", "cand_id", "adc_dist", "rn")
    )


def _pq_oracle() -> str:
    ctes = []
    for m in range(PQ_M):
        sq = lambda a, b: _sqdist_sql(a, b, PQ_SUBDIM)  # noqa: E731
        ctes.append(
            f"""sub{m} AS (
    SELECT vec_id, list_transform(range(1, {PQ_SUBDIM} + 1),
        i -> CAST(embedding[{m * PQ_SUBDIM} + i] AS DOUBLE)) AS v
    FROM embeddings
)"""
        )
        ctes.append(
            f"""c0_{m} AS (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
    FROM sub{m} ORDER BY vec_id LIMIT {PQ_K}
)"""
        )
        ctes.append(
            f"""a0_{m} AS (
    SELECT vec_id, cid FROM (
        SELECT s.vec_id, c.cid, {sq("s.v", "c.cv")} AS dist
        FROM sub{m} s CROSS JOIN c0_{m} c)
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
)"""
        )
        ctes.append(
            f"""c1_{m} AS (
    SELECT cid, list(mn ORDER BY pos) AS cv FROM (
        SELECT a.cid, r.pos, {davg_sql("s.v[r.pos]")} AS mn
        FROM a0_{m} a JOIN sub{m} s USING (vec_id)
        CROSS JOIN (SELECT CAST(range AS INTEGER) AS pos
                    FROM range(1, {PQ_SUBDIM} + 1)) r
        GROUP BY a.cid, r.pos)
    GROUP BY cid
)"""
        )
        ctes.append(
            f"""code{m} AS (
    SELECT vec_id, cid AS code FROM (
        SELECT s.vec_id, c.cid, {sq("s.v", "c.cv")} AS dist
        FROM sub{m} s CROSS JOIN c1_{m} c)
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
)"""
        )
        ctes.append(
            f"""qd{m} AS (
    SELECT s.vec_id AS query_id, c.cid, {sq("s.v", "c.cv")} AS qd
    FROM sub{m} s CROSS JOIN c1_{m} c
    WHERE s.vec_id < {N_QUERIES}
)"""
        )
    joins = "\n    ".join(
        f"JOIN qd{m} ON qd{m}.query_id = qd0.query_id AND qd{m}.cid = cs.code{m}"
        for m in range(1, PQ_M)
    )
    code_joins = " ".join(
        f"JOIN code{m} c{m} ON c{m}.vec_id = c0.vec_id" for m in range(1, PQ_M)
    )
    code_cols = ", ".join(f"c{m}.code AS code{m}" for m in range(1, PQ_M))
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
cs AS (
    SELECT c0.vec_id AS cand_id, c0.code AS code0, {code_cols}
    FROM code0 c0 {code_joins}
),
scored AS (
    SELECT qd0.query_id, cs.cand_id,
           qd0.qd + qd1.qd + qd2.qd + qd3.qd AS adc_dist
    FROM cs
    JOIN qd0 ON qd0.cid = cs.code0
    {joins}
    WHERE cs.cand_id <> qd0.query_id
)
SELECT query_id, cand_id, adc_dist, rn FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc_dist, cand_id) AS rn
    FROM scored
) WHERE rn <= {PQ_TOPK}"""
    )


register("similarity_pq_adc", _q_pq_adc, _pq_oracle())
