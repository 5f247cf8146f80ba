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
the process cwd. Idempotence is TWO-LEVEL (ADVICE r07): a
``_STAGED_OK`` flag carrying a source-corpus + derivation fingerprint
marks the on-disk layout valid, and a fresh session that finds a valid
layout re-registers the catalog entry with ``CREATE TABLE ... CLUSTERED
BY ... LOCATION`` instead of rewriting the files — the wav staging's
flag discipline, extended with the catalog-re-attach step bucketed
tables need because the bucket spec lives in the metastore, not the
parquet files. This removes the steady-state cross-process race (every
process with a valid layout only reads); the REBUILD path (first
staging, or a fingerprint change) still overwrites, so a process
scanning while another rebuilds can fail mid-read — acceptable for
test-fixture staging, where rebuilds mean the corpus itself changed.
A production deployment registers the table once in a shared metastore
and writes new snapshots to fresh paths instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strategy_analyzer_exporter_spark.functions import TOKENS_SQL, tokens
from strategy_analyzer_exporter_spark.registry import register, register_deferred
from strategy_analyzer_exporter_spark.sources.staging import (
    staging_root,
    staging_suffix,
)
from strategy_analyzer_exporter_spark.sources.tables import load_table

N_BUCKETS = 8


# bump when the written layout changes (bucket count, sort spec,
# column set) — part of the fingerprint, so old on-disk tables are
# rewritten instead of re-attached. The DERIVATION of the staged
# columns is fingerprinted separately below (TOKENS_SQL + the column
# exprs), so a tokenizer change invalidates the staging without anyone
# remembering to bump this (r08 review).
_BUCKETED_STAGE_VERSION = "v1"

# the staged tables' derivation contract: token rule (TOKENS_SQL is the
# oracle-shared definition of tokens(), so it moves whenever the
# tokenizer does) + the docs projection
_DERIVATION_FP = f"tokens={TOKENS_SQL};docs=doc_id,length(text)"


def _suffix(sf_dir: str) -> str:
    return staging_suffix(os.path.abspath(sf_dir))


def corpus_fingerprint(
    sf_dir: str,
    source: str = "documents.parquet",
    derivation: str | None = None,
    version: str = _BUCKETED_STAGE_VERSION,
    n_buckets: int = N_BUCKETS,
) -> str:
    """Cheap source-staleness fingerprint: the source parquet's
    path + size + mtime (recursed when it's a directory), plus the
    layout version and the staged columns' DERIVATION string. No Spark
    job — staging validity must be checkable before a session has read
    anything. Shared by every at-rest layout (token tables, the dedup
    index, the IVF-PQ code table)."""
    import hashlib

    if derivation is None:
        derivation = _DERIVATION_FP
    src = os.path.join(os.path.abspath(sf_dir), source)
    parts = [version, derivation, f"buckets={n_buckets}", src]
    paths = [src]
    if os.path.isdir(src):
        paths = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(src)
            for f in fs
        )
    for p in paths:
        try:
            st = os.stat(p)
            parts.append(f"{p}|{st.st_size}|{st.st_mtime_ns}")
        except OSError:
            parts.append(f"{p}|missing")
    return hashlib.md5("\n".join(parts).encode()).hexdigest()[:12]


def _write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: tuple[str, ...] = ("doc_id",),
    n_buckets: int = N_BUCKETS,
) -> None:
    (
        df.repartition(n_buckets, *bucket_cols)
        .write.bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def ensure_bucketed(
    spark: SparkSession,
    table: str,
    ddl_cols: str,
    fingerprint: str,
    build,
    bucket_cols: tuple[str, ...] = ("doc_id",),
    n_buckets: int = N_BUCKETS,
    vacuums: tuple[str, ...] = (),
) -> None:
    """Three-way idempotence: (catalog has table, on-disk flag valid) →
    no-op; (no catalog entry, flag valid) → re-ATTACH via CREATE TABLE
    ... CLUSTERED BY ... LOCATION, zero rewrite — the steady-state
    concurrent-process fix; anything else → (re)write files + catalog
    entry, then write the flag LAST so a reader never sees a valid flag
    over half-written buckets. The rebuild path itself is not
    concurrency-safe (see module docstring). Shared by every at-rest
    bucketed layout in the engine (token tables here, the dedup
    signature/band index in dedup.py) — the staging discipline lives in
    exactly one place.

    ``vacuums`` declares the vacuum predicates the caller EXPECTS the
    layout to carry (ADVICE r10): a layout whose ``_VACUUMED`` manifest
    disagrees — in particular a mistakenly-vacuumed copy of a pristine
    table — no longer satisfies the fingerprint's derivation contract
    and is rebuilt instead of silently re-attached."""
    from strategy_analyzer_exporter_spark.sources import epochs

    path = os.path.join(staging_root(), "bucketed", table)
    flag = os.path.join(path, "_STAGED_OK")
    cols = ", ".join(bucket_cols)
    disk_ok = False
    try:
        with open(flag) as f:
            disk_ok = f.read().strip() == fingerprint
    except OSError:
        pass
    disk_ok = disk_ok and epochs.vacuum_state(path) == list(vacuums)
    if spark.catalog.tableExists(table):
        if disk_ok:
            epochs.ensure_base([path])  # adopt-on-attach (VERDICT r10 #3)
            return
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    if disk_ok:
        spark.sql(
            f"CREATE TABLE {table} ({ddl_cols}) USING parquet "
            f"CLUSTERED BY ({cols}) SORTED BY ({cols}) "
            f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
        )
        epochs.ensure_base([path])
        return
    if os.path.exists(flag):
        os.remove(flag)  # invalidate before touching the data files
    # wipe the whole layout, not just the flag: a crashed prior run (or
    # a crashed APPEND — stale _EPOCH_* markers, half-written bucket
    # files) must not leak into the rebuilt table, and under
    # partitionOverwriteMode=dynamic an overwrite alone wouldn't
    # truncate files the new write doesn't shadow (ADVICE r09 class).
    # A torn compaction SWAP additionally leaves __old/__compact
    # siblings holding a full table copy each — the cleanup lives here,
    # with the staging discipline, so every caller inherits it
    # (ADVICE r10)
    import shutil

    for p in (path, f"{path}__old", f"{path}__compact"):
        shutil.rmtree(p, ignore_errors=True)
    _write_bucketed(build(), table, path, bucket_cols, n_buckets)
    epochs.record_base([path])
    with open(flag, "w") as f:
        f.write(fingerprint)



def compact_bucketed_table(
    spark: SparkSession,
    table: str,
    ddl_cols: str,
    bucket_cols: tuple[str, ...] = ("doc_id",),
    n_buckets: int = N_BUCKETS,
    drop_ids: tuple[DataFrame, str] | None = None,
    vacuum_pred: str | None = None,
) -> None:
    """Index maintenance (VERDICT r09 #3): after K appends each bucket
    holds K+1 files; rewrite the table back to ONE file per bucket,
    preserving the bucket spec, the ``_STAGED_OK`` fingerprint (the
    source/derivation contract is unchanged by compaction) and the
    epoch manifest (re-marked ``compacted`` — see epochs module).

    The 100 TB shape: write a full compacted copy NEXT TO the live
    layout (readers keep working against the old files), then swap
    directories and re-attach the catalog entry — never a rewrite in
    place, which would race the read of the very files being replaced.
    The swap itself is two renames; a crash between them loses the
    flag/markers (they travel with the directories), so the next ensure
    pass rebuilds — degraded to the pre-epoch behavior, never wrong.

    ``drop_ids`` = (tiny id relation, key column): VACUUM — the rewrite
    broadcast-anti-joins the ids out, physically purging tombstoned
    rows while the files are being rewritten anyway. Probe-time
    tombstones make deletion FAST (no rewrite); vacuum at the next
    compaction makes it PHYSICAL (takedown compliance: the bytes are
    gone) — the two halves of how real lakes delete. ``vacuum_pred``
    (required with ``drop_ids``) is the vacuum's declared-state record:
    it lands in the layout's ``_VACUUMED`` manifest so validation can
    tell the vacuumed layout from the pristine one (ADVICE r10)."""
    import shutil

    from strategy_analyzer_exporter_spark.sources import epochs

    if drop_ids is not None and vacuum_pred is None:
        raise ValueError(
            "compact with drop_ids requires vacuum_pred — an undeclared "
            "vacuum would be indistinguishable from the pristine layout"
        )
    path = os.path.join(staging_root(), "bucketed", table)
    # compacting a TORN layout would fold half-committed rows into the
    # compacted table and destroy the tear evidence: the chain then
    # validates, the next ensure sees the epoch as missing and replays
    # it — duplicated rows. Same guard as dedup_index_append (ADVICE
    # r10, medium).
    ok, _ = epochs.chain_state([path])
    if not ok:
        raise RuntimeError(
            f"compact_bucketed_table on an invalid epoch chain for "
            f"{table}; rebuild the layout first"
        )
    flag = os.path.join(path, "_STAGED_OK")
    with open(flag) as f:
        fp = f.read()
    tmp_tbl = f"{table}__compact"
    tmp_path = f"{path}__compact"
    spark.sql(f"DROP TABLE IF EXISTS {tmp_tbl}")
    shutil.rmtree(tmp_path, ignore_errors=True)
    # full copy first — the read executes while the old files are still
    # live. Read the PARQUET FILES, not the catalog table: the bucketed
    # scan advertises hashpartitioning(bucket cols), which lets the
    # planner elide _write_bucketed's repartition — but a multi-file
    # bucket scan splits into MORE tasks than buckets, so the "one file
    # per bucket" write discipline breaks (measured: 27 files from an
    # 8-bucket table). A plain parquet read advertises unknown
    # partitioning, the repartition survives, one task per bucket.
    src = spark.read.parquet(path)
    if drop_ids is not None:
        ids, key = drop_ids
        src = src.join(F.broadcast(ids), key, "left_anti")
    _write_bucketed(src, tmp_tbl, tmp_path, bucket_cols, n_buckets)
    spark.sql(f"DROP TABLE IF EXISTS {tmp_tbl}")  # external: files stay
    # carry flag + epoch history + vacuum manifest into the compacted
    # layout, then mark every epoch compacted (their file lists now
    # describe nothing; the base record is re-snapshot over the new
    # listing inside rewrite_compacted)
    for name in os.listdir(path):
        if name == "_VACUUMED" or (
            name.startswith("_EPOCH_") and name.endswith("_OK")
        ):
            shutil.copy2(os.path.join(path, name), os.path.join(tmp_path, name))
    epochs.rewrite_compacted(tmp_path)
    if vacuum_pred is not None:
        epochs.record_vacuum(tmp_path, vacuum_pred)
    with open(os.path.join(tmp_path, "_STAGED_OK"), "w") as f:
        f.write(fp)
    # swap + re-attach
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    old = f"{path}__old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp_path, path)
    shutil.rmtree(old)
    cols = ", ".join(bucket_cols)
    spark.sql(
        f"CREATE TABLE {table} ({ddl_cols}) USING parquet "
        f"CLUSTERED BY ({cols}) SORTED BY ({cols}) "
        f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
    )


def bucketed_doc_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Ensure the two bucketed tables for ``sf_dir`` exist and return
    their names: docs (doc_id, doc_len) and token rows (doc_id, token),
    both bucketed+sorted by doc_id with one file per bucket."""
    suf = _suffix(sf_dir)
    fp = corpus_fingerprint(sf_dir)
    docs_tbl = f"bkt_docs_{suf}"
    toks_tbl = f"bkt_tokens_{suf}"
    ensure_bucketed(
        spark,
        docs_tbl,
        "doc_id BIGINT, doc_len BIGINT",
        fp,
        lambda: load_table(spark, sf_dir, "documents").select(
            "doc_id", F.length("text").cast("long").alias("doc_len")
        ),
    )
    ensure_bucketed(
        spark,
        toks_tbl,
        "doc_id BIGINT, token STRING",
        fp,
        lambda: load_table(spark, sf_dir, "documents").select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("token")
        ),
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


# ---------------------------------------------------------------------------
# A real second consumer of the bucketed layout (VERDICT r07 #3): the
# TF-IDF top-k query re-expressed over the at-rest token table instead
# of re-exploding `documents`. Same output, same oracle
# (text_tfidf_topk's — reused via register_deferred, never duplicated).
#
# What the layout buys this plan, vs pipeline3._q_tfidf:
#   1. no tokenize+explode recompute — the token rows are parquet at
#      rest (the repeated-pass story: every pass over a 100 TB corpus
#      re-paying tokenization is the single biggest avoidable cost);
#   2. the tf = groupBy(doc_id, token) aggregation of the FULL token
#      stream is exchange-free — hashpartitioning(doc_id) from the
#      bucketed scan satisfies ClusteredDistribution(doc_id, token)
#      (partitioning expressions ⊆ grouping keys), so the one shuffle
#      that moves every token row in the re-explode form disappears;
#   3. the remaining exchanges (df_docs on token, the scored join, the
#      per-doc ranking window) operate on AGGREGATED relations — tf
#      rows and vocab rows — never the raw token stream.
# Exchange counts and 1×/10× wall times for both twins are recorded by
# bench.py (headline `exchanges` + scale probe).
#
# Arithmetic is kept IDENTICAL to the re-explode form (same cast
# chain, same tf·(N/df) linear idf) so both twins hash-match the same
# DuckDB oracle bit-for-bit.

TFIDF_TOPK = 3  # = pipeline3.TFIDF_TOPK (module-level sibling imports
# are forbidden — tests/test_pipeline_ops.py::
# test_operator_modules_import_standalone; the deferred registration
# below would catch a drift by failing the shared-oracle hash compare)


def _q_tfidf_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs_tbl, toks_tbl = bucketed_doc_tables(spark, sf_dir)
    tok = spark.table(toks_tbl)
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_docs = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
    # n_docs counts ALL documents (the docs table has one row per doc,
    # zero-token docs included), matching the oracle's FROM documents
    n_docs = spark.table(docs_tbl).agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_docs, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (
                F.col("n_docs").cast("double")
                / F.col("df_docs").cast("double")
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TFIDF_TOPK)
        .select("doc_id", "token", "tf", "df_docs", "score", "rn")
    )


def _register_tfidf_bucketed() -> None:
    from strategy_analyzer_exporter_spark.registry import ORACLES

    register(
        "text_tfidf_topk_bucketed",
        _q_tfidf_bucketed,
        ORACLES["text_tfidf_topk"],
    )


register_deferred(_register_tfidf_bucketed, requires=("text_tfidf_topk",))


# ---------------------------------------------------------------------------
# BM25 over the at-rest token table (VERDICT r11 #5): the third
# consumer of the bucketed layout. text_bm25_topk re-tokenizes the
# corpus every run; this twin reads the staged token rows instead and
# keeps the arithmetic IDENTICAL (same cast chain, same linear idf,
# same parenthesization), so it hash-matches text_bm25_topk's DuckDB
# oracle bit-for-bit (reused via register_deferred, never duplicated).
#
# What the layout buys (the tfidf_bucketed story, bucketed.py:370, on
# the second production query shape):
#   1. no tokenize+explode recompute — at 100 TB the dominant cost of
#      every retrieval pass;
#   2. tf = groupBy(doc_id, token) and dl = groupBy(doc_id) both ride
#      the bucketed scan's hashpartitioning(doc_id) — exchange-free;
#   3. what does shuffle (df on token, the query-term join, the
#      per-term ranking window) only ever moves AGGREGATED relations
#      (tf rows, the vocabulary, the 5-term posting lists).
# avgdl parity: Σdl = the token-table row count and n_docs = the docs
# table row count (zero-token docs included, matching the re-tokenize
# twin's per-document rows) — both exact integers, so the single
# division is the identical correctly-rounded double in both twins.

BM25_K1 = 1.2  # = pipeline3.BM25_* (module-level sibling imports are
BM25_B = 0.75  # forbidden — see the TFIDF_TOPK note above; the shared
BM25_TOPK = 3  # oracle makes any drift a hash mismatch at the gate)
BM25_QTERMS = 5


def _q_bm25_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs_tbl, toks_tbl = bucketed_doc_tables(spark, sf_dir)
    tok = spark.table(toks_tbl)
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfd = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    qterms = dfd.orderBy(F.col("df").desc(), F.col("token").asc()).limit(
        BM25_QTERMS
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("dl"))
    n_docs = spark.table(docs_tbl).agg(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    sum_dl = tok.agg(F.count(F.lit(1)).cast("long").alias("sum_dl"))
    stats = (
        n_docs.crossJoin(sum_dl)
        .select(
            "n_docs",
            (F.col("sum_dl").cast("double") / F.col("n_docs")).alias("avgdl"),
        )
    )
    tf_d = F.col("tf").cast("double")
    dl_d = F.col("dl").cast("double")
    score = (F.col("n_docs") / F.col("df").cast("double")) * (
        (tf_d * F.lit(BM25_K1 + 1.0))
        / (
            tf_d
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (dl_d / F.col("avgdl")))
        )
    )
    scored = (
        qterms.join(tf, "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("token", "doc_id", "tf", "dl", score.alias("bm25"))
    )
    w = Window.partitionBy("token").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= BM25_TOPK)
        .select("token", "doc_id", "tf", "dl", "bm25", "rn")
    )


def _register_bm25_bucketed() -> None:
    from strategy_analyzer_exporter_spark.registry import ORACLES

    register(
        "text_bm25_topk_bucketed",
        _q_bm25_bucketed,
        ORACLES["text_bm25_topk"],
    )


register_deferred(_register_bm25_bucketed, requires=("text_bm25_topk",))
