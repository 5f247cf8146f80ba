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
    import os

    from strategy_analyzer_exporter_spark.functions import vector
    from strategy_analyzer_exporter_spark.operators.pipeline import kmeans_assign

    # abspath-normalized like the dedup gram cache (ADVICE r08): a
    # relative spelling of the same corpus must not fork a duplicate
    # ~20-job Lloyd/encode build and leak its localCheckpoint lineage
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir),
           vector.kernel())
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


def _adc_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, cand_id, adc_dist) for every query×candidate pair —
    the shared ADC core of both the flat-PQ and the IVF-PQ query."""
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
    return scored.filter(F.col("cand_id") != F.col("query_id")).select(
        "query_id", "cand_id", adc
    )


def _adc_topk(scored: DataFrame) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist"), F.col("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= PQ_TOPK)
        .select("query_id", "cand_id", "adc_dist", "rn")
    )


def _q_pq_adc(
    spark: SparkSession, sf_dir: str, mode: str = "auto"
) -> DataFrame:
    """Flat-PQ ADC top-k.

    ``mode="auto"`` (registered default, r15 — VERDICT r14 #1: the
    static cells default lost 27% at the judged SF where distinct
    cells ≈ n and the extra aggregation is pure cost): pick the shape
    from cheap metadata the way ``spread_scan`` does — the corpus row
    count from the parquet FOOTER (a driver-side pyarrow read, no
    Spark job). Below PQ_K**PQ_M = 65,536 rows the cell space cannot
    meaningfully collapse the candidate set (reduction is bounded by
    n/cells ≥ n/65,536 < 1 order), so the pairs shape's lower fixed
    cost wins; above it the cell reduction grows linearly in n and
    cells wins (measured crossover: r14 interleaved med-of-3 — 1×
    n=2k: pairs 0.593 vs cells 0.730; 10× n=20k: 1.924 vs 1.963
    (tied); 100× n=200k: 3.584 vs cells 2.465, reduction 78×; r15
    re-measurement in OPTIMIZATION_r15.md). Both shapes produce
    identical rows (twin-tested, oracle-checked), so the switch is a
    plan decision, not a semantic one — the same contract as
    spread_scan's split-count trigger.

    ``mode="cells"`` (r14 — guide §8 "decide with small rows"): every
    candidate sharing a code word (code0..code3)
    has the SAME adc_dist for a given query, so the per-candidate
    decision collapses onto DISTINCT CELLS. One hash aggregation over
    the codes relation builds (cell → 4 smallest member vec_ids); the
    per-query ADC chain then scores ≤ min(n, 16⁴) cell rows instead of
    n candidates, and the final ordering runs over ≤ PQ_TOPK·(PQ_TOPK+1)
    rows per query. Per-query work is bounded by PQ_K^PQ_M = 65,536
    cells FOREVER — the only O(n) step left is the single metadata
    aggregation (doc: vec_ids are 8-byte longs; nothing vector-sized
    shuffles). Keeping the (PQ_TOPK+1)=4 smallest ids per cell is
    sufficient: the self-match exclusion removes at most one of them,
    and a candidate in the global top-k is at worst the k-th eligible
    of its own cell; a cell holding a global top-k candidate is itself
    within the top-k cells ordered by (adc_dist, first-eligible-id) —
    if c cells rank strictly before it, their first eligibles plus the
    candidate's own cell-local predecessors all precede it globally,
    so c + (rank within cell) ≤ PQ_TOPK. Output is EXACTLY the pairs
    form's (twin-tested and oracle-checked): adc_dist is the identical
    left-associated qd0+qd1+qd2+qd3 over the identical codes.

    ``mode="pairs"``: the pre-r14 shape — score all n×N_QUERIES pairs
    through the broadcast chain, then row_number over N_QUERIES window
    partitions (each sorting n rows: measured exp 1.26 at the 1×→10×
    probe, with 10 window tasks on 32 cores)."""
    if mode == "auto":
        from strategy_analyzer_exporter_spark.operators.pipeline import (
            _corpus_rows,
        )

        n = _corpus_rows(sf_dir, "embeddings")
        if n < 0:
            n = load_table(spark, sf_dir, "embeddings").count()
        mode = "cells" if n > PQ_K**PQ_M else "pairs"
    if mode == "pairs":
        return _adc_topk(_adc_scored(spark, sf_dir))
    if mode != "cells":
        raise ValueError(f"unknown pq-adc mode: {mode!r}")
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
    cell_cols = [f"code{m}" for m in range(PQ_M)]
    # (cell → 4 smallest member ids): ONE hash agg over 8-byte ids.
    # collect_list's partial state per (task, cell) is bounded by the
    # task's input split; at a scale where that matters, add a
    # pmod(vec_id, B) bucket level (two-level top-k, guide §2.5) —
    # at every probed tier the single level measures flat.
    cells = codes.groupBy(*cell_cols).agg(
        F.slice(F.array_sort(F.collect_list("vec_id")), 1, PQ_TOPK + 1)
        .alias("m4")
    )
    scored = cells
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
    qcells = scored.select(
        "query_id",
        adc,
        F.filter("m4", lambda x: x != F.col("query_id")).alias("cands"),
    ).filter(F.size("cands") > 0)
    # top-PQ_TOPK cells per query: bounded-state aggregation (≤ 16⁴
    # structs per group), no n-row window partition anywhere. The sort
    # key (adc_dist, cands) is a total order: cells are disjoint, so
    # equal-distance cells differ in their first eligible id.
    top = qcells.groupBy("query_id").agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct("adc_dist", "cands"))),
            1,
            PQ_TOPK,
        ).alias("tc")
    )
    ex = (
        top.select("query_id", F.explode("tc").alias("c"))
        .select(
            "query_id",
            F.col("c.adc_dist").alias("adc_dist"),
            F.explode("c.cands").alias("cand_id"),
        )
        .select("query_id", "cand_id", "adc_dist")
    )
    return _adc_topk(ex)


def _pq_sql_parts(train_pred: str | None = None) -> tuple[list, str, str, str]:
    """(cte list, qd joins, code joins, code cols) — the PQ pipeline's
    SQL pieces, shared by the flat-PQ and IVF-PQ oracles so the two can
    never drift. ``train_pred`` (a predicate over ``vec_id``) restricts
    the CODEBOOK TRAINING relations (init + the assignment feeding the
    centroid update) to the at-rest corpus for the frozen-ingest
    variant; encoding (code CTEs) always covers every vector. None
    keeps the emitted SQL byte-identical to the unparameterized form."""
    ctes = []
    train_where = f"\n    WHERE {train_pred}" if train_pred else ""
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
    FROM sub{m}{train_where} ORDER BY vec_id LIMIT {PQ_K}
)"""
        )
        ctes.append(
            f"""a0_{m} AS (
    SELECT vec_id, cid FROM (
        SELECT s.vec_id, c.cid, {sq("s.v", "c.cv")} AS dist
        FROM sub{m} s CROSS JOIN c0_{m} c{train_where})
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
    return ctes, joins, code_joins, code_cols


def _adc_sql(ctes: list, joins: str, code_joins: str, code_cols: str,
             extra_joins: str = "",
             out_cols: str = "query_id, cand_id, adc_dist, rn",
             cand_pred: str | None = None) -> str:
    # cand_pred restricts the CANDIDATE set only (tombstones: deleted
    # vectors stay in the trained index but never surface at probe)
    cand_where = f"\n      AND ({cand_pred})" if cand_pred else ""
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
    {extra_joins}
    WHERE cs.cand_id <> qd0.query_id{cand_where}
)
SELECT {out_cols} FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc_dist, cand_id) AS rn
    FROM scored
) WHERE rn <= {PQ_TOPK}"""
    )


def _pq_oracle() -> str:
    return _adc_sql(*_pq_sql_parts())


register("similarity_pq_adc", _q_pq_adc, _pq_oracle())


# ---------------------------------------------------------------------------
# IVF-PQ (r08): the composed production index — a COARSE quantizer
# partitions the corpus into cells (one exact Lloyd round over the full
# 64-dim vectors, same recipe as the subspace codebooks), each query
# probes only its IVF_NPROBE nearest cells, and ADC scores only the
# vectors in probed cells. This is the index every large-vector-store
# deployment actually runs (Jégou et al. §V: IVFADC): candidate volume
# per query drops from N to ~N·nprobe/cells, and at rest the code
# table is STORED partitioned by cell, so a probe reads nprobe/cells
# of the corpus — the scan itself prunes. At test scale the cell
# restriction is expressed as a join against the cell assignment (the
# semantics are identical; the at-rest pruning story is bucketed.py's).
#
# Determinism/parity: cell assignment and probe choice are integer
# decisions whose margins dwarf the engines' sub-ulp centroid-mean
# drift (pipeline.kmeans_update_from_v comment), and the emitted
# adc_dist reuses the flat-PQ arithmetic unchanged — same float-parity
# budget as similarity_pq_adc (bit-exact at the sf0.01 gate; the same
# documented sub-ulp floor rows at sf0.1).

IVF_CELLS = 8
IVF_NPROBE = 2


def _fullv(emb: DataFrame) -> DataFrame:
    return emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def _coarse_index(spark: SparkSession, sf_dir: str):
    """(cells, cents): per-vector cell assignment + the coarse centroid
    relation, memoized like the PQ index (built once, probed many)."""
    import os

    from strategy_analyzer_exporter_spark.functions import vector
    from strategy_analyzer_exporter_spark.operators.pipeline import (
        kmeans_assign,
        kmeans_update,
    )

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir),
           vector.kernel(), "ivf")
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    fv = _fullv(load_table(spark, sf_dir, "embeddings"))
    c0 = ranked_init(fv, "vec_id", IVF_CELLS, "cid").select(
        "cid", F.col("v").alias("cv")
    )
    assigned = kmeans_assign(fv, c0).select("vec_id", "cid")
    cents = kmeans_update(assigned, fv).localCheckpoint()
    cells = (
        kmeans_assign(fv, cents)
        .select("vec_id", F.col("cid").alias("cell"))
        .localCheckpoint()
    )
    _INDEX_CACHE[key] = (cells, cents)
    return cells, cents


def _q_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strategy_analyzer_exporter_spark.functions import vector

    cells, cents = _coarse_index(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    fq = (
        _fullv(emb)
        .filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    )
    qc = fq.crossJoin(F.broadcast(cents)).select(
        "query_id", "cid", vector.sqdist(F.col("qv"), F.col("cv")).alias("d")
    )
    wp = Window.partitionBy("query_id").orderBy(F.col("d"), F.col("cid"))
    probe = (
        qc.withColumn("prn", F.row_number().over(wp))
        .filter(F.col("prn") <= IVF_NPROBE)
        .select("query_id", F.col("cid").alias("cell"))
    )
    ivf_cand = probe.join(
        cells.withColumnRenamed("vec_id", "cand_id"), "cell"
    ).select("query_id", "cand_id")
    # r14 (guide §3/§8): restrict THEN score — attach codes to the IVF
    # candidate pairs and run the per-subspace lookup joins with
    # query_id bound (the _at_rest_topk chain), instead of scoring all
    # n×N_QUERIES pairs and joining the restriction in afterwards.
    # Candidate volume through the ADC chain drops from n·N_QUERIES to
    # n·nprobe/cells·N_QUERIES; output rows are the identical set with
    # the identical adc_dist arithmetic (pre-r14 shape: _adc_scored
    # joined on (query_id, cand_id) — an n×10-row intermediate).
    pq_codes, cbs = _pq_index(spark, sf_dir)
    restricted = ivf_cand.join(
        pq_codes.withColumnRenamed("vec_id", "cand_id"), "cand_id"
    )
    scored = restricted
    for m in range(PQ_M):
        sub = _subspace(emb, m)
        q_sub = sub.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        qd_m = q_sub.crossJoin(F.broadcast(cbs[m])).select(
            F.col("query_id").alias("qid"),
            F.col("cid").alias(f"qcid{m}"),
            vector.sqdist(F.col("qv"), F.col("cv")).alias(f"qd{m}"),
        )
        scored = scored.join(
            F.broadcast(qd_m),
            (scored[f"code{m}"] == qd_m[f"qcid{m}"])
            & (scored["query_id"] == qd_m["qid"]),
        ).drop(f"qcid{m}", "qid")
    scored = scored.filter(F.col("cand_id") != F.col("query_id")).select(
        "query_id",
        "cand_id",
        (F.col("qd0") + F.col("qd1") + F.col("qd2") + F.col("qd3")).alias(
            "adc_dist"
        ),
    )
    # adc_dist stays INTERNAL (the _q_kmeans convention): the coarse
    # centroids carry the engines' sub-ulp decimal-mean drift, and the
    # IVF-restricted top-k happens to select a drift-affected pair at
    # the sf0.01 gate (measured 1/30 rows at 7.7e-13 rel). Selection is
    # integer-robust — min relative adc gap in the top-5 measured
    # 7.3e-4 at sf0.01 (9 orders above the drift) and exact ties break
    # on cand_id identically in both engines — so the emitted
    # (query_id, cand_id, rn) rows are engine-exact; the drift-bearing
    # float is simply not part of the contract, exactly like kmeans
    # cluster ids.
    return _adc_topk(scored).select("query_id", "cand_id", "rn")


def _ivfpq_oracle(
    train_pred: str | None = None, cand_pred: str | None = None
) -> str:
    ctes, joins, code_joins, code_cols = _pq_sql_parts(train_pred)
    dim = PQ_M * PQ_SUBDIM
    sq = lambda a, b: _sqdist_sql(a, b, dim)  # noqa: E731
    train_where = f"\n    WHERE {train_pred}" if train_pred else ""
    ctes.append(
        f"""fullv AS (
    SELECT vec_id, list_transform(range(1, {dim} + 1),
        i -> CAST(embedding[i] AS DOUBLE)) AS v
    FROM embeddings
)"""
    )
    ctes.append(
        f"""g0 AS (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
    FROM fullv{train_where} ORDER BY vec_id LIMIT {IVF_CELLS}
)"""
    )
    ctes.append(
        f"""ga0 AS (
    SELECT vec_id, cid FROM (
        SELECT s.vec_id, c.cid, {sq("s.v", "c.cv")} AS dist
        FROM fullv s CROSS JOIN g0 c{train_where})
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
)"""
    )
    ctes.append(
        f"""g1 AS (
    SELECT cid, list(mn ORDER BY pos) AS cv FROM (
        SELECT a.cid, r.pos, {davg_sql("s.v[r.pos]")} AS mn
        FROM ga0 a JOIN fullv s USING (vec_id)
        CROSS JOIN (SELECT CAST(range AS INTEGER) AS pos
                    FROM range(1, {dim} + 1)) r
        GROUP BY a.cid, r.pos)
    GROUP BY cid
)"""
    )
    ctes.append(
        f"""cell AS (
    SELECT vec_id, cid AS cell FROM (
        SELECT s.vec_id, c.cid, {sq("s.v", "c.cv")} AS dist
        FROM fullv s CROSS JOIN g1 c)
    QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1
)"""
    )
    ctes.append(
        f"""probe AS (
    SELECT query_id, cid AS cell FROM (
        SELECT s.vec_id AS query_id, c.cid, {sq("s.v", "c.cv")} AS dist
        FROM fullv s CROSS JOIN g1 c
        WHERE s.vec_id < {N_QUERIES})
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY dist, cid) <= {IVF_NPROBE}
)"""
    )
    extra = (
        "JOIN cell ON cell.vec_id = cs.cand_id\n"
        "    JOIN probe ON probe.query_id = qd0.query_id "
        "AND probe.cell = cell.cell"
    )
    return _adc_sql(
        ctes, joins, code_joins, code_cols, extra_joins=extra,
        out_cols="query_id, cand_id, rn", cand_pred=cand_pred,
    )


register("similarity_ivfpq_topk", _q_ivfpq, _ivfpq_oracle())


# ---------------------------------------------------------------------------
# IVF-PQ AT REST (VERDICT r08 #2): similarity_ivfpq_topk expresses the
# cell restriction as a join against an in-session cell assignment;
# this twin makes the production at-rest story REAL. The index build
# (coarse quantizer + PQ codebooks + per-vector codes) runs once and is
# STORED:
#   codes/      parquet, PARTITIONED BY cell — (vec_id, code0..3)
#   codebooks/  parquet — (m, cid, cv): the M per-subspace codebooks
#   centroids/  parquet — (cid, cv): the coarse quantizer
# under the staging fingerprint/_STAGED_OK discipline (bucketed.py).
# A probe session reads ONLY stored artifacts: the coarse centroids
# (IVF_CELLS rows) pick each query's nprobe cells, the union of probed
# cells becomes a LITERAL IN-filter on the partition column, and the
# scan itself prunes — `PartitionFilters: [cell IN (...)]`,
# plan-asserted by tests/test_plans.py. No Lloyd/encode work at query
# time: this is the index-build-at-ingest / probe-at-query split every
# vector store runs, and what "nprobe/cells of the corpus is READ"
# means physically. The probed-cell collect is nprobe × N_QUERIES ≤ 20
# rows — bounded by the query-matrix design, same class as the 10-row
# query matrix itself.
#
# Parity: codebooks/centroids are double arrays — parquet round-trips
# IEEE-754 exactly, so qd/adc arithmetic is bit-identical to the
# in-session twin; codes/cells are exact ints. The two kernels (arrow/
# fold) produce bit-identical indexes (module docstring), so the staged
# index is kernel-independent. Oracle REUSED from similarity_ivfpq_topk
# via register_deferred — same rows, zero drift possible.

_PQ_STAGE_VERSION = "v2"  # v2: epoch/append-log protocol (VERDICT r09 #2)


def _pq_idx_derivation() -> str:
    """Derivation fingerprint for the staged index: the PQ/IVF
    geometry constants + a hash of the ACTUAL index-build source
    (_codebook, _pq_index, _coarse_index, and the kmeans primitives
    they compose) — r09 review: a hand-maintained tag like
    'init=ranked_vec_id;lloyd=1' goes stale silently when the Lloyd
    recipe changes, replaying a stale staged index only on machines
    with pre-existing staging. Over-invalidation on comment edits is
    the safe direction."""
    import hashlib
    import inspect

    from strategy_analyzer_exporter_spark.functions.topk import ranked_init
    from strategy_analyzer_exporter_spark.operators.pipeline import (
        kmeans_assign,
        kmeans_update,
    )

    code = "".join(
        inspect.getsource(f)
        for f in (_codebook, _pq_index, _coarse_index, kmeans_assign,
                  kmeans_update, ranked_init)
    )
    return (
        f"ivfpq;M={PQ_M}x{PQ_SUBDIM};K={PQ_K};cells={IVF_CELLS};"
        f"nprobe={IVF_NPROBE};code={hashlib.md5(code.encode()).hexdigest()[:12]}"
    )


def ivfpq_index_dir(
    spark: SparkSession,
    sf_dir: str,
    name_extra: str = "",
    vacuums: tuple[str, ...] = (),
) -> str:
    """Ensure the at-rest IVF-PQ index for ``sf_dir`` exists on disk and
    return its directory. Build path reuses the memoized in-session
    index relations; probe sessions never enter it (flag valid →
    read-only). ``name_extra`` forks an independent copy; ``vacuums``
    declares physical deletions (vec_id predicates, applied via vacuum
    compaction of the codes table) that the layout's ``_VACUUMED``
    manifest must match exactly — an undeclared vacuum, or a pristine
    layout where one was declared, fails validation and rebuilds
    (VERDICT r10 #4 + ADVICE r10)."""
    import os

    from strategy_analyzer_exporter_spark.operators.bucketed import (
        corpus_fingerprint,
    )
    from strategy_analyzer_exporter_spark.sources import epochs
    from strategy_analyzer_exporter_spark.sources.staging import (
        staging_root,
        staging_suffix,
    )

    sf_dir = os.path.abspath(sf_dir)
    fp = corpus_fingerprint(
        sf_dir,
        source="embeddings.parquet",
        derivation=_pq_idx_derivation(),
        version=_PQ_STAGE_VERSION,
    )
    d = os.path.join(
        staging_root(),
        f"pq_index_{_PQ_STAGE_VERSION}_{staging_suffix(sf_dir, name_extra)}",
    )
    flag = os.path.join(d, "_STAGED_OK")
    codes_dir = os.path.join(d, "codes")
    expected_vacs = list(vacuums)
    try:
        with open(flag) as f:
            base_ok = f.read().strip() == fp
    except OSError:
        base_ok = False
    if base_ok:
        chain_ok, _ = epochs.chain_state([codes_dir])
        rec_vacs = epochs.vacuum_state(codes_dir)
        if chain_ok and rec_vacs == expected_vacs[: len(rec_vacs)]:
            epochs.ensure_base([codes_dir])  # adopt-on-attach (r10 #3)
            for vac_pred in expected_vacs[len(rec_vacs):]:
                ids = (
                    spark.read.parquet(codes_dir)
                    .filter(F.expr(vac_pred))
                    .select("vec_id")
                )
                compact_codes_dir(
                    spark, d, vacuum_ids=ids, vacuum_pred=vac_pred
                )
            return d
    if os.path.exists(flag):
        os.remove(flag)  # invalidate before touching data files
    # wipe the whole dir, not just the flag: under
    # partitionOverwriteMode=dynamic the corpus overwrite would leave a
    # crashed prior run's files in cells the new write doesn't shadow —
    # duplicate vec_ids in the staged index (ADVICE r09)
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    codes, cbs = _pq_index(spark, sf_dir)
    cells, cents = _coarse_index(spark, sf_dir)
    (
        codes.join(cells, "vec_id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(d, "codes"))
    )
    cb_all = None
    for m, cb in enumerate(cbs):
        part = cb.select(F.lit(m).alias("m"), "cid", "cv")
        cb_all = part if cb_all is None else cb_all.unionByName(part)
    cb_all.write.mode("overwrite").parquet(os.path.join(d, "codebooks"))
    cents.write.mode("overwrite").parquet(os.path.join(d, "centroids"))
    epochs.record_base([codes_dir])
    with open(flag, "w") as f:
        f.write(fp)
    for vac_pred in expected_vacs:
        ids = (
            spark.read.parquet(codes_dir)
            .filter(F.expr(vac_pred))
            .select("vec_id")
        )
        compact_codes_dir(spark, d, vacuum_ids=ids, vacuum_pred=vac_pred)
    return d


def _at_rest_topk(
    spark: SparkSession,
    sf_dir: str,
    d: str,
    tombstones: DataFrame | None = None,
) -> DataFrame:
    """The probe half of the at-rest index family: read centroids /
    codebooks / cell-partitioned codes from ``d`` (stored artifacts
    only), prune the codes scan to the probed cells, ADC-score, top-k.
    Shared by similarity_ivfpq_at_rest, the frozen-ingest twin and the
    tombstoned twin — they differ only in how the index directory was
    built / which candidates survive.

    ``tombstones`` (VERDICT r09 #4): a tiny (vec_id) relation of
    DELETED vectors, anti-joined against the pruned codes scan — the
    probe-time retirement path (takedowns, dedup losers) that spares a
    full index rebuild. Broadcast anti-join: no new exchange, the plan
    keeps riding the partition-pruned scan (plan-asserted in
    tests/test_plans.py)."""
    import os

    from strategy_analyzer_exporter_spark.functions import vector

    emb = load_table(spark, sf_dir, "embeddings")
    cents = spark.read.parquet(os.path.join(d, "centroids"))
    fq = (
        _fullv(emb)
        .filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    )
    qc = fq.crossJoin(F.broadcast(cents)).select(
        "query_id", "cid", vector.sqdist(F.col("qv"), F.col("cv")).alias("d")
    )
    wp = Window.partitionBy("query_id").orderBy(F.col("d"), F.col("cid"))
    probe_df = (
        qc.withColumn("prn", F.row_number().over(wp))
        .filter(F.col("prn") <= IVF_NPROBE)
        .select("query_id", F.col("cid").alias("cell"))
    )
    # nprobe × N_QUERIES ≤ 20 rows — bounded by design (see header).
    # Collected ONCE and re-materialized as a local relation: the probe
    # set is needed both as literal partition-filter values and as the
    # per-query cell restriction, and reusing the collected rows keeps
    # the coarse-probe computation (query × centroid cross + window)
    # from executing twice per run.
    probe_rows = probe_df.collect()
    probed_cells = sorted({int(r["cell"]) for r in probe_rows})
    probe = spark.createDataFrame(probe_rows, schema=probe_df.schema)
    codes = spark.read.parquet(os.path.join(d, "codes")).filter(
        F.col("cell").isin(probed_cells)  # literal IN → partition pruning
    )
    if tombstones is not None:
        codes = codes.join(F.broadcast(tombstones), "vec_id", "left_anti")
    cb = spark.read.parquet(os.path.join(d, "codebooks"))
    restricted = probe.join(
        codes.withColumnRenamed("vec_id", "cand_id"), "cell"
    ).select("cand_id", "query_id", *[f"code{m}" for m in range(PQ_M)])
    scored = restricted
    for m in range(PQ_M):
        sub = _subspace(emb, m)
        q_sub = sub.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        cb_m = cb.filter(F.col("m") == m).select("cid", F.col("cv").alias("cv"))
        qd_m = q_sub.crossJoin(F.broadcast(cb_m)).select(
            F.col("query_id").alias("qid"),
            F.col("cid").alias(f"qcid{m}"),
            vector.sqdist(F.col("qv"), F.col("cv")).alias(f"qd{m}"),
        )
        scored = scored.join(
            F.broadcast(qd_m),
            (scored[f"code{m}"] == qd_m[f"qcid{m}"])
            & (scored["query_id"] == qd_m["qid"]),
        ).drop(f"qcid{m}", "qid")
    adc = (
        F.col("qd0") + F.col("qd1") + F.col("qd2") + F.col("qd3")
    ).alias("adc_dist")
    scored = scored.filter(F.col("cand_id") != F.col("query_id")).select(
        "query_id", "cand_id", adc
    )
    return _adc_topk(scored).select("query_id", "cand_id", "rn")


def _q_ivfpq_at_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _at_rest_topk(spark, sf_dir, ivfpq_index_dir(spark, sf_dir))


def _register_ivfpq_at_rest() -> None:
    from strategy_analyzer_exporter_spark.registry import ORACLES

    register(
        "similarity_ivfpq_at_rest",
        _q_ivfpq_at_rest,
        ORACLES["similarity_ivfpq_topk"],
    )


from strategy_analyzer_exporter_spark.registry import (  # noqa: E402
    register_deferred,
)

register_deferred(_register_ivfpq_at_rest, requires=("similarity_ivfpq_topk",))


# ---------------------------------------------------------------------------
# FROZEN-CODEBOOK INGEST (r09, the vector twin of dedup_index_append):
# production vector stores never retrain on ingest — codebooks and the
# coarse quantizer are trained once on the at-rest corpus and FROZEN
# (the FAISS IVF/PQ operating model); late-arriving vectors are encoded
# with the stored artifacts and appended to the cell-partitioned code
# table. This query stages exactly that lifecycle:
#   1. TRAIN on the corpus split (vec_id % 10 != 0): coarse centroids,
#      M codebooks — one exact Lloyd round each, same recipe as the
#      full-corpus index;
#   2. write the corpus's codes (partitionBy cell) + the frozen
#      codebook/centroid relations;
#   3. INGEST the late batch (vec_id % 10 == 0) by READING THE STORED
#      codebooks/centroids BACK from parquet — the append path is
#      structurally incapable of touching training state — encoding
#      the batch, and appending into the cell partitions;
#   4. probe through the same _at_rest_topk as similarity_ivfpq_at_rest.
# Crash safety (v2, VERDICT r09 #2): _STAGED_OK validates the BASE
# build only (written after every base artifact exists); each ingest
# epoch carries its own two-phase PENDING/OK markers in the codes dir
# (sources/epochs.py), so a valid flag does NOT imply a fully-ingested
# index — consumers must validate base fingerprint + the epoch chain
# against their declared appends, which is exactly what
# ivfpq_frozen_dir does. A killed base staging never validates; a
# killed append leaves PENDING and forces rebuild.
#
# The oracle is the IVF-PQ oracle with the TRAINING relations (c0/a0,
# g0/ga0) restricted to the corpus split while encoding covers every
# vector — exactly the frozen semantics. Parity: parquet round-trips
# the codebook doubles bit-exactly, so batch codes computed from
# read-back relations equal a monolithic train-on-corpus/encode-all
# computation; output stays the integer (query_id, cand_id, rn)
# contract.

VEC_BATCH_MOD = 10  # vec_id % 10 == 0 = the late-arriving batch


def _frozen_train_pred():
    return F.col("vec_id") % VEC_BATCH_MOD != 0


#: the registered query's declared epoch chain: ONE batch append
#: covering the late-arriving split (tests fork with name_extra and
#: declare multi-append chains)
_FROZEN_DEFAULT_APPENDS = (f"vec_id % {VEC_BATCH_MOD} = 0",)


def ivfpq_frozen_dir(
    spark: SparkSession,
    sf_dir: str,
    name_extra: str = "",
    appends: tuple[str, ...] = _FROZEN_DEFAULT_APPENDS,
) -> str:
    """Ensure the frozen-ingest index exists AT THE DECLARED STATE:
    base = train on the corpus split + write corpus codes/codebooks/
    centroids + ``_STAGED_OK``; each entry of ``appends`` (SQL
    predicates over vec_id, ingest order) is an encode-only epoch
    (``ivfpq_encode_append``) recorded in the codes directory's epoch
    chain. A fresh session validates base fingerprint + chain against
    ``appends`` and RE-ATTACHES (replaying only missing epochs) instead
    of rebuilding — VERDICT r09 #2; the r9 single-append-inside-staging
    shape is now just the default chain. A torn epoch or any mismatch
    wipes the directory (also ADVICE r09: an overwrite alone leaves a
    crashed appender's cell files behind under
    partitionOverwriteMode=dynamic) and rebuilds."""
    import os
    import shutil

    from strategy_analyzer_exporter_spark.operators.bucketed import (
        corpus_fingerprint,
    )
    from strategy_analyzer_exporter_spark.operators.pipeline import (
        kmeans_assign,
        kmeans_update,
    )
    from strategy_analyzer_exporter_spark.sources import epochs
    from strategy_analyzer_exporter_spark.sources.staging import (
        staging_root,
        staging_suffix,
    )

    sf_dir = os.path.abspath(sf_dir)
    fp = corpus_fingerprint(
        sf_dir,
        source="embeddings.parquet",
        derivation=_pq_idx_derivation()
        + f";train=vec_id%{VEC_BATCH_MOD}<>0;frozen_ingest",
        version=_PQ_STAGE_VERSION,
    )
    d = os.path.join(
        staging_root(),
        f"pq_frozen_{_PQ_STAGE_VERSION}_{staging_suffix(sf_dir, name_extra)}",
    )
    flag = os.path.join(d, "_STAGED_OK")
    codes_dir = os.path.join(d, "codes")
    base_ok = False
    try:
        with open(flag) as f:
            base_ok = f.read().strip() == fp
    except OSError:
        pass
    expected = list(appends)
    chain_ok, preds = epochs.chain_state([codes_dir])
    if (
        base_ok
        and chain_ok
        # this entry point declares no vacuums: a vacuumed layout no
        # longer matches the fingerprint's derivation (ADVICE r10)
        and epochs.vacuum_state(codes_dir) == []
        and len(preds) <= len(expected)
        and preds == expected[: len(preds)]
    ):
        epochs.ensure_base([codes_dir])  # adopt-on-attach (r10 #3)
        for pred_sql in expected[len(preds):]:
            ivfpq_encode_append(spark, sf_dir, d, pred_sql)
        return d
    shutil.rmtree(d, ignore_errors=True)
    emb = load_table(spark, sf_dir, "embeddings")
    train = _frozen_train_pred()
    # --- 1. train + 2. write the corpus index ---------------------------
    fv_train = _fullv(emb).filter(train)
    g0 = ranked_init(fv_train, "vec_id", IVF_CELLS, "cid").select(
        "cid", F.col("v").alias("cv")
    )
    cents = kmeans_update(
        kmeans_assign(fv_train, g0).select("vec_id", "cid"), fv_train
    ).localCheckpoint()
    cb_all = None
    corpus_codes = None
    for m in range(PQ_M):
        sub_train = _subspace(emb, m).filter(train)
        cb = _codebook(sub_train)
        part = cb.select(F.lit(m).alias("m"), "cid", "cv")
        cb_all = part if cb_all is None else cb_all.unionByName(part)
        code_m = kmeans_assign(sub_train, cb).select(
            "vec_id", F.col("cid").alias(f"code{m}")
        )
        corpus_codes = (
            code_m if corpus_codes is None else corpus_codes.join(code_m, "vec_id")
        )
    corpus_cells = kmeans_assign(fv_train, cents).select(
        "vec_id", F.col("cid").alias("cell")
    )
    (
        corpus_codes.join(corpus_cells, "vec_id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(d, "codes"))
    )
    cb_all.write.mode("overwrite").parquet(os.path.join(d, "codebooks"))
    cents.write.mode("overwrite").parquet(os.path.join(d, "centroids"))
    # --- 3. flag marks the BASE as committed; append epochs carry their
    # own two-phase markers (a killed base staging never validates — the
    # flag is written after every base artifact exists). The base record
    # (epoch 0) snapshots the corpus codes' file listing first, so the
    # chain rejects data files accounted for by neither base nor any
    # epoch — an out-of-band writer's files (VERDICT r10 #3)
    epochs.record_base([codes_dir])
    with open(flag, "w") as f:
        f.write(fp)
    # --- 4. ingest epochs from READ-BACK artifacts only -----------------
    for pred_sql in expected:
        ivfpq_encode_append(spark, sf_dir, d, pred_sql)
    return d


def ivfpq_encode_append(
    spark: SparkSession, sf_dir: str, d: str, pred_sql: str
) -> None:
    """Encode-only ingest epoch (the FAISS operating model): read the
    FROZEN codebooks/centroids back from ``d`` — the append path is
    structurally incapable of touching training state — encode the
    vectors matching ``pred_sql`` (M+1 broadcast-assign map passes, no
    retrain), and append their codes into the cell partitions.
    Two-phase epoch markers in the codes directory (PENDING before any
    data file, OK with added files + row counts as the commit point)
    make the append crash-safe and SESSION-DURABLE: a fresh session
    re-attaches a committed append, a torn one forces rebuild
    (VERDICT r09 #2)."""
    import os

    from strategy_analyzer_exporter_spark.operators.pipeline import kmeans_assign
    from strategy_analyzer_exporter_spark.sources import epochs

    codes_dir = os.path.join(d, "codes")
    ok, preds = epochs.chain_state([codes_dir])
    if not ok:
        # same hazard as dedup_index_append (r10 review): renumbering
        # from an invalid chain clobbers an existing OK record and the
        # chain then validates over duplicated code rows
        raise RuntimeError(
            f"ivfpq_encode_append on an invalid epoch chain in {d}; "
            f"rebuild via ivfpq_frozen_dir(...) first"
        )
    n = len(preds) + 1
    base_fp = ""
    try:
        with open(os.path.join(d, "_STAGED_OK")) as f:
            base_fp = f.read().strip()
    except OSError:
        pass
    epochs.begin_epoch([codes_dir], n, pred_sql)
    before = epochs.data_files(codes_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    batch = F.expr(pred_sql)
    stored_cents = spark.read.parquet(os.path.join(d, "centroids"))
    stored_cbs = spark.read.parquet(os.path.join(d, "codebooks"))
    batch_codes = None
    for m in range(PQ_M):
        sub_b = _subspace(emb, m).filter(batch)
        cb_m = stored_cbs.filter(F.col("m") == m).select("cid", "cv")
        code_m = kmeans_assign(sub_b, cb_m).select(
            "vec_id", F.col("cid").alias(f"code{m}")
        )
        batch_codes = (
            code_m if batch_codes is None else batch_codes.join(code_m, "vec_id")
        )
    batch_cells = kmeans_assign(_fullv(emb).filter(batch), stored_cents).select(
        "vec_id", F.col("cid").alias("cell")
    )
    (
        batch_codes.join(batch_cells, "vec_id")
        .write.mode("append")
        .partitionBy("cell")
        .parquet(codes_dir)
    )
    added = {
        rel: sz
        for rel, sz in epochs.data_files(codes_dir).items()
        if rel not in before
    }
    epochs.commit_epoch([codes_dir], n, pred_sql, {codes_dir: added}, base_fp)


def compact_codes_dir(
    spark: SparkSession,
    d: str,
    vacuum_ids: DataFrame | None = None,
    vacuum_pred: str | None = None,
) -> None:
    """Compaction for the cell-partitioned code table (VERDICT r09 #3):
    after K encode-append epochs each probed cell reads K+1 file
    groups; rewrite to ONE file per cell (repartition by the partition
    column puts each cell's rows in exactly one task), preserving the
    epoch manifest (re-marked compacted). Copy-then-swap like
    compact_bucketed_table — never in place.

    ``vacuum_ids``: a tiny (vec_id) relation to PHYSICALLY purge during
    the rewrite — the physical half of deletion (probe-time tombstones
    are the fast half); afterwards the tombstone anti-join over those
    ids is a no-op and the vectors' codes are gone from disk. Never
    vacuum an index a registered query reads — oracle semantics
    describe the unvacuumed corpus; vacuum forks only (and the vacuum
    is recorded: ``vacuum_pred``, required with ``vacuum_ids``, lands
    in the codes directory's ``_VACUUMED`` manifest so attach-time
    validation distinguishes a vacuumed fork from the pristine layout —
    ADVICE r10)."""
    import os
    import shutil

    from strategy_analyzer_exporter_spark.sources import epochs

    if vacuum_ids is not None and vacuum_pred is None:
        raise ValueError(
            "compact_codes_dir with vacuum_ids requires vacuum_pred — an "
            "undeclared vacuum would validate as the pristine layout"
        )
    codes_dir = os.path.join(d, "codes")
    # compacting a torn append would fold half-committed code rows into
    # the compacted table and destroy the tear evidence; the next
    # declared-state ensure would then REPLAY the epoch over duplicated
    # rows. Same guard as ivfpq_encode_append (ADVICE r10, medium).
    ok, _ = epochs.chain_state([codes_dir])
    if not ok:
        raise RuntimeError(
            f"compact_codes_dir on an invalid epoch chain in {d}; "
            f"rebuild via ivfpq_frozen_dir/ivfpq_index_dir first"
        )
    tmp = f"{codes_dir}__compact"
    shutil.rmtree(tmp, ignore_errors=True)
    src = spark.read.parquet(codes_dir)
    if vacuum_ids is not None:
        src = src.join(F.broadcast(vacuum_ids), "vec_id", "left_anti")
    (
        src
        .repartition("cell")
        .write.partitionBy("cell")
        .parquet(tmp)
    )
    for name in os.listdir(codes_dir):
        if name == "_VACUUMED" or (
            name.startswith("_EPOCH_") and name.endswith("_OK")
        ):
            shutil.copy2(os.path.join(codes_dir, name), os.path.join(tmp, name))
    epochs.rewrite_compacted(tmp)
    if vacuum_pred is not None:
        epochs.record_vacuum(tmp, vacuum_pred)
    old = f"{codes_dir}__old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(codes_dir, old)
    os.rename(tmp, codes_dir)
    shutil.rmtree(old)


def _q_ivfpq_frozen(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _at_rest_topk(spark, sf_dir, ivfpq_frozen_dir(spark, sf_dir))


register(
    "similarity_ivfpq_frozen_ingest",
    _q_ivfpq_frozen,
    _ivfpq_oracle(train_pred=f"vec_id % {VEC_BATCH_MOD} <> 0"),
)


# ---------------------------------------------------------------------------
# TOMBSTONES (VERDICT r09 #4): documents get removed from corpora
# (takedowns, dedup losers); rebuilding a 100 TB index per deletion is
# not a path. The retirement shape every vector store runs: deleted ids
# live in a tiny tombstone RELATION, anti-joined against the candidate
# stream at probe time — the trained index (codebooks, centroids,
# codes) is untouched, the deleted vector simply never surfaces. The
# oracle applies the same exclusion as a candidate predicate while its
# TRAINING relations still cover every vector — exactly "deleted from
# serving, not from history". Output contract unchanged: integer
# (query_id, cand_id, rn); ranks RESHUFFLE below a deleted candidate,
# which is what makes this a value-checked query rather than a filter
# bolted on top of the baseline's rows.

VEC_TOMB_MOD = 13
VEC_TOMB_RESIDUE = 5  # delete vec_id ≡ 5 (mod 13) — hits baseline top-k rows


def vec_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deleted-vector relation, staged once as a tiny parquet
    (flag keyed on the index fingerprint + predicate) and derived from
    the AT-REST codes table — ids of vectors the index actually serves,
    no corpus rescan. At 100 TB this is the takedown list: thousands of
    rows against billions, always broadcastable."""
    import os
    import shutil

    from strategy_analyzer_exporter_spark.sources.staging import (
        staging_root,
        staging_suffix,
    )

    from strategy_analyzer_exporter_spark.sources import epochs

    d_idx = ivfpq_index_dir(spark, sf_dir)
    with open(os.path.join(d_idx, "_STAGED_OK")) as f:
        idx_fp = f.read().strip()
    pred = f"vec_id % {VEC_TOMB_MOD} = {VEC_TOMB_RESIDUE}"
    # key the staged id list on the committed epoch chain, not just the
    # base fingerprint: under the v2 protocol the base fingerprint
    # survives appends, so a pre-append id list would keep validating
    # while newly appended vectors matching the residue were never
    # filtered (ADVICE r10)
    _, chain_preds = epochs.chain_state([os.path.join(d_idx, "codes")])
    fp = f"{idx_fp};chain={chain_preds!r};{pred}"
    td = os.path.join(
        staging_root(),
        f"vec_tomb_{staging_suffix(os.path.abspath(sf_dir))}",
    )
    flag = os.path.join(td, "_STAGED_OK")
    ok = False
    try:
        with open(flag) as f:
            ok = f.read().strip() == fp
    except OSError:
        pass
    if not ok:
        shutil.rmtree(td, ignore_errors=True)
        (
            spark.read.parquet(os.path.join(d_idx, "codes"))
            .filter(F.expr(pred))
            .select("vec_id")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(td, "ids"))
        )
        with open(flag, "w") as f:
            f.write(fp)
    return spark.read.parquet(os.path.join(td, "ids"))


def _q_ivfpq_tombstoned(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ivfpq_index_dir(spark, sf_dir)
    return _at_rest_topk(
        spark, sf_dir, d, tombstones=vec_tombstones(spark, sf_dir)
    )


register(
    "similarity_ivfpq_tombstoned",
    _q_ivfpq_tombstoned,
    _ivfpq_oracle(
        cand_pred=f"cs.cand_id % {VEC_TOMB_MOD} <> {VEC_TOMB_RESIDUE}"
    ),
)


# --- vacuum, end to end (VERDICT r10 #4, the vector twin) -------------------
# A forked index is vacuum-compacted over the SAME vec_ids the
# tombstone query filters, then probed with NO anti-join — the deleted
# vectors' codes are physically gone from the cell partitions, so the
# pruned probe scan simply never reads them. Oracle identical to the
# tombstoned query's: physical purge and probe-time exclusion must be
# observationally equivalent (test_pq_lifecycle.py proves it on a unit
# fork; this query proves it through the driver gate every round). The
# vacuum is DECLARED (vacuums=(pred,)), so fresh sessions re-attach the
# vacuumed layout with zero writes while an undeclared vacuum of a
# pristine index fails the manifest check (ADVICE r10).

VEC_VACUUM_PRED = f"vec_id % {VEC_TOMB_MOD} = {VEC_TOMB_RESIDUE}"


def _q_ivfpq_vacuumed(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ivfpq_index_dir(
        spark, sf_dir, name_extra="vacuumed", vacuums=(VEC_VACUUM_PRED,)
    )
    return _at_rest_topk(spark, sf_dir, d)


register(
    "similarity_ivfpq_vacuumed",
    _q_ivfpq_vacuumed,
    _ivfpq_oracle(
        cand_pred=f"cs.cand_id % {VEC_TOMB_MOD} <> {VEC_TOMB_RESIDUE}"
    ),
)
