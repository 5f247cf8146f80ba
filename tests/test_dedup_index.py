"""At-rest dedup index (VERDICT r08 #3): the corpus's gram + band
relations persisted as bucketed tables, the incremental query serving
its corpus side from them, and the ingest APPEND step."""

import os

import pytest
from pyspark.sql import functions as F

from strategy_analyzer_exporter_spark import plans as P

SF = "/root/testdata/sf0.001"


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_at_rest_incremental_equals_in_memory_twin(spark):
    """The at-rest layout is a storage refactor, not a semantics
    change: its pairs (and exact jaccard values) must equal the
    in-memory incremental query's bit-for-bit."""
    from strategy_analyzer_exporter_spark.registry import QUERIES

    at_rest = _sorted_rows(QUERIES["dedup_incremental_at_rest"](spark, SF))
    in_mem = _sorted_rows(QUERIES["dedup_incremental_minhash"](spark, SF))
    assert at_rest == in_mem
    assert len(at_rest) > 0  # non-vacuous: the fixture has near-dups


def test_at_rest_plan_serves_corpus_from_bucketed_tables(spark):
    """The corpus side is served from the three at-rest tables (band,
    gram — scanned exactly once, by the verify's doc_a join — and the
    stored sizes), with no MORE exchanges than the in-memory twin and
    the corpus NEVER re-shingled."""
    from strategy_analyzer_exporter_spark.operators.dedup import BATCH_MOD
    from strategy_analyzer_exporter_spark.registry import QUERIES

    q = QUERIES["dedup_incremental_at_rest"](spark, SF)
    plan = P.physical_plan(q)
    # gram + band scans ride their bucket layouts; the tiny sizes scan
    # may print "Bucketed: false (disabled by query planner)" — Spark
    # auto-disables bucketed reading when the join side is broadcast
    # and the layout buys nothing, which is itself correct behavior
    assert plan.count("Bucketed: true") >= 2, plan
    assert "dedup_size_idx" in plan, plan
    base = P.count_exchanges(QUERIES["dedup_incremental_minhash"](spark, SF))
    assert P.count_exchanges(q) <= base, plan
    # the corpus is NEVER re-shingled: every documents scan in this
    # plan carries the batch split predicate (the only shingle pass is
    # the batch side's — its cached lineage reprints under each
    # InMemoryTableScan, so count the scans' filters, not the UDF
    # node strings)
    doc_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "documents.parquet" in ln
    ]
    assert doc_scans, plan
    assert all(f"% {BATCH_MOD}) = 0" in ln for ln in doc_scans), doc_scans


def _drop_index(spark, tables):
    import shutil

    from strategy_analyzer_exporter_spark.sources.staging import staging_root

    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(
            os.path.join(staging_root(), "bucketed", t), ignore_errors=True
        )


def _listing(tables):
    """{table: sorted (relpath, size, mtime_ns) of every file}."""
    from strategy_analyzer_exporter_spark.sources.staging import staging_root

    out = {}
    for t in tables:
        d = os.path.join(staging_root(), "bucketed", t)
        rows = []
        for r, _, fs in os.walk(d):
            for f in fs:
                p = os.path.join(r, f)
                st = os.stat(p)
                rows.append((os.path.relpath(p, d), st.st_size, st.st_mtime_ns))
        out[t] = sorted(rows)
    return out


def test_dedup_index_append_extends_the_index(spark):
    """The ingest append: after appending the batch split to a fresh
    copy of the index, the tables hold every doc's rows (corpus ∪
    batch == the full band/gram relations), and the epoch manifest
    records the committed append (VERDICT r09 #2 — the flag survives;
    PENDING markers are gone)."""
    from strategy_analyzer_exporter_spark.operators.dedup import (
        BATCH_MOD,
        _band_rows,
        _gram_rows,
        _sig_rows,
        dedup_index_append,
        dedup_index_tables,
    )
    from strategy_analyzer_exporter_spark.sources import epochs
    from strategy_analyzer_exporter_spark.sources.staging import staging_root

    tables = dedup_index_tables(spark, SF, name_extra="apptest")
    gram_tbl, band_tbl, size_tbl = tables
    try:
        full_grams = _gram_rows(spark, SF).count()
        full_bands = _band_rows(_sig_rows(spark, SF)).count()
        full_docs = _sig_rows(spark, SF).count()
        assert spark.table(gram_tbl).count() < full_grams  # corpus only
        dedup_index_append(
            spark, SF, tables, f"doc_id % {BATCH_MOD} = 0"
        )
        assert spark.table(gram_tbl).count() == full_grams
        assert spark.table(band_tbl).count() == full_bands
        assert spark.table(size_tbl).count() == full_docs
        # appended rows land in the CORRECT buckets: a doc_id-keyed
        # aggregation over the appended gram table still needs no
        # exchange (bucket spec enforced on append)
        agg = spark.table(gram_tbl).groupBy("doc_id").count()
        assert P.count_exchanges(agg) == 0, P.physical_plan(agg)
        # the epoch chain is COMMITTED (OK marker with the predicate,
        # no PENDING left, recorded files + row counts real) and the
        # base flag SURVIVES — a fresh session can re-attach
        dirs = [os.path.join(staging_root(), "bucketed", t) for t in tables]
        ok, preds = epochs.chain_state(dirs)
        assert ok and preds == [f"doc_id % {BATCH_MOD} = 0"], (ok, preds)
        import json

        with open(os.path.join(dirs[0], "_EPOCH_0001_OK")) as f:
            rec = json.load(f)
        assert rec["files"] and rec["rows"] > 0, rec
        for t in tables:
            assert os.path.exists(
                os.path.join(staging_root(), "bucketed", t, "_STAGED_OK")
            )
    finally:
        _drop_index(spark, tables)


def test_appended_index_survives_session_boundary(spark):
    """VERDICT r09 #2's Done-criterion: stage → append → NEW session
    (simulated by dropping the catalog entries — the epoch chain and
    flags live on disk) → declaring the same appends RE-ATTACHES with
    ZERO staging writes (byte-identical file listing) and the batch
    query over the appended index stays correct."""
    from strategy_analyzer_exporter_spark.operators.dedup import (
        _at_rest_incremental,
        _LC_APPEND_PRED,
        _LC_BATCH_PRED,
        dedup_index_tables,
    )

    appends = (_LC_APPEND_PRED,)
    tables = dedup_index_tables(
        spark, SF, name_extra="sessiontest", appends=appends
    )
    try:
        expected_rows = sorted(
            tuple(r)
            for r in _at_rest_incremental(
                spark, SF, tables, batch_pred_sql=_LC_BATCH_PRED
            ).collect()
        )
        before = _listing(tables)
        for t in tables:
            spark.sql(f"DROP TABLE {t}")  # external: files stay
        tables2 = dedup_index_tables(
            spark, SF, name_extra="sessiontest", appends=appends
        )
        assert tables2 == tables
        assert _listing(tables) == before  # zero staging write jobs
        got = sorted(
            tuple(r)
            for r in _at_rest_incremental(
                spark, SF, tables2, batch_pred_sql=_LC_BATCH_PRED
            ).collect()
        )
        assert got == expected_rows and len(got) > 0
    finally:
        _drop_index(spark, tables)


def test_torn_epoch_forces_rebuild(spark):
    """A PENDING marker without its OK (the appender crashed mid-write)
    must fail validation and force a full rebuild + replay — the
    poison-proofing the r9 flag-removal bought, kept."""
    from strategy_analyzer_exporter_spark.operators.dedup import (
        _LC_APPEND_PRED,
        dedup_index_tables,
    )
    from strategy_analyzer_exporter_spark.sources import epochs
    from strategy_analyzer_exporter_spark.sources.staging import staging_root

    appends = (_LC_APPEND_PRED,)
    tables = dedup_index_tables(spark, SF, name_extra="torntest", appends=appends)
    try:
        dirs = [os.path.join(staging_root(), "bucketed", t) for t in tables]
        gram_rows = spark.table(tables[0]).count()
        # simulate the crash: a second append began but never committed
        with open(os.path.join(dirs[0], "_EPOCH_0002_PENDING"), "w") as f:
            f.write('{"pred": "crashed"}')
        assert epochs.chain_state(dirs) == (False, [])
        # compacting the torn layout would fold the half-committed rows
        # in and destroy the tear evidence — the entry point must refuse
        # (ADVICE r10, the dedup_index_append guard mirrored)
        import pytest

        from strategy_analyzer_exporter_spark.operators.dedup import (
            compact_dedup_index,
        )

        with pytest.raises(RuntimeError, match="invalid epoch chain"):
            compact_dedup_index(spark, tables)
        before = _listing(tables)
        tables2 = dedup_index_tables(
            spark, SF, name_extra="torntest", appends=appends
        )
        after = _listing(tables2)
        assert after != before  # rebuilt, not re-attached
        ok, preds = epochs.chain_state(dirs)
        assert ok and preds == list(appends)
        assert spark.table(tables2[0]).count() == gram_rows
        assert not os.path.exists(os.path.join(dirs[0], "_EPOCH_0002_PENDING"))
    finally:
        _drop_index(spark, tables)


def test_compaction_one_file_per_bucket(spark):
    """VERDICT r09 #3's Done-criterion: after 3 appends each bucket
    holds several files; compaction rewrites to ONE file per bucket,
    preserves the bucket spec (doc_id-keyed agg still exchange-free),
    keeps the epoch manifest valid, and changes no query output."""
    from strategy_analyzer_exporter_spark.operators.bucketed import N_BUCKETS
    from strategy_analyzer_exporter_spark.operators.dedup import (
        BATCH_MOD,
        compact_dedup_index,
        dedup_index_tables,
    )
    from strategy_analyzer_exporter_spark.sources import epochs
    from strategy_analyzer_exporter_spark.sources.staging import staging_root

    appends = tuple(
        f"doc_id % {3 * BATCH_MOD} = {r * BATCH_MOD}" for r in range(3)
    )  # three disjoint slices of the batch split (incl. residue 0)
    tables = dedup_index_tables(spark, SF, name_extra="cmptest", appends=appends)
    try:
        dirs = [os.path.join(staging_root(), "bucketed", t) for t in tables]

        def bucket_files(d):
            return [
                f for f in os.listdir(d)
                if f.startswith("part-") and f.endswith(".parquet")
            ]

        assert len(bucket_files(dirs[0])) > N_BUCKETS  # appends piled up
        rows_before = {
            t: sorted(tuple(r) for r in spark.table(t).collect())
            for t in tables
        }
        compact_dedup_index(spark, tables)
        for d in dirs:
            assert len(bucket_files(d)) <= N_BUCKETS, os.listdir(d)
        ok, preds = epochs.chain_state(dirs)
        assert ok and preds == list(appends)  # history survives
        for t in tables:
            assert (
                sorted(tuple(r) for r in spark.table(t).collect())
                == rows_before[t]
            )
        agg = spark.table(tables[0]).groupBy("doc_id").count()
        assert P.count_exchanges(agg) == 0, P.physical_plan(agg)
        plan = P.physical_plan(agg)
        assert "Bucketed: true" in plan, plan
        # compacted layout still validates + re-attaches across a
        # session boundary with zero writes
        before = _listing(tables)
        for t in tables:
            spark.sql(f"DROP TABLE {t}")
        dedup_index_tables(spark, SF, name_extra="cmptest", appends=appends)
        assert _listing(tables) == before
    finally:
        _drop_index(spark, tables)


def test_vacuum_purges_tombstoned_rows_physically(spark):
    """The physical half of deletion: compacting with vacuum_ids drops
    the tombstoned docs' gram/band/size rows from disk, after which the
    probe WITHOUT any anti-join equals the tombstoned probe BEFORE the
    vacuum — and the layout still holds one file per bucket, a valid
    epoch chain, and zero-write re-attach."""
    from pyspark.sql import functions as F2

    from strategy_analyzer_exporter_spark.operators.dedup import (
        _at_rest_incremental,
        compact_dedup_index,
        dedup_index_tables,
    )
    from strategy_analyzer_exporter_spark.sources import epochs
    from strategy_analyzer_exporter_spark.sources.staging import staging_root

    tables = dedup_index_tables(spark, SF, name_extra="vactest")
    try:
        tomb = (
            spark.table(tables[2])
            .filter(F2.col("doc_id") % 7 == 1)
            .select("doc_id")
            .localCheckpoint()  # pin the ids: the source table is rewritten
        )
        n_tomb = tomb.count()
        assert n_tomb > 0
        gram_before = spark.table(tables[0]).count()
        want = sorted(
            tuple(r)
            for r in _at_rest_incremental(
                spark, SF, tables, tombstones=tomb
            ).collect()
        )
        vac_pred = "doc_id % 7 = 1"
        compact_dedup_index(
            spark, tables, vacuum_ids=tomb, vacuum_pred=vac_pred
        )
        # rows physically gone from all three tables
        assert spark.table(tables[2]).join(tomb, "doc_id").count() == 0
        assert spark.table(tables[0]).join(tomb, "doc_id").count() == 0
        assert spark.table(tables[1]).join(tomb, "doc_id").count() == 0
        assert spark.table(tables[0]).count() < gram_before
        # probe WITHOUT the anti-join now equals the tombstoned probe
        got = sorted(
            tuple(r)
            for r in _at_rest_incremental(spark, SF, tables).collect()
        )
        assert got == want
        dirs = [os.path.join(staging_root(), "bucketed", t) for t in tables]
        ok, _ = epochs.chain_state(dirs)
        assert ok
        # the vacuum is RECORDED (ADVICE r10): a session that DECLARES
        # it re-attaches the vacuumed layout with zero writes...
        assert all(epochs.vacuum_state(d) == [vac_pred] for d in dirs)
        before = _listing(tables)
        for t in tables:
            spark.sql(f"DROP TABLE {t}")
        dedup_index_tables(
            spark, SF, name_extra="vactest", vacuums=(vac_pred,)
        )
        assert _listing(tables) == before  # vacuumed layout re-attaches
        # ...while presenting the vacuumed layout as PRISTINE (no
        # declared vacuums) fails the manifest check and rebuilds — the
        # previously-undetectable mistaken-vacuum corruption
        for t in tables:
            spark.sql(f"DROP TABLE {t}")
        dedup_index_tables(spark, SF, name_extra="vactest")
        assert all(epochs.vacuum_state(d) == [] for d in dirs)
        assert spark.table(tables[2]).join(tomb, "doc_id").count() == n_tomb
    finally:
        _drop_index(spark, tables)


def test_tombstoned_docs_never_appear(spark):
    """VERDICT r09 #4: a tombstoned corpus doc never appears in the
    incremental pairs; every other pair survives untouched; the
    exclusion is non-vacuous (the baseline HAD pairs with tombstoned
    corpus docs); and the anti-join is a broadcast that adds no
    exchange over the baseline plan."""
    from strategy_analyzer_exporter_spark.operators.dedup import (
        DOC_TOMB_MOD,
        DOC_TOMB_RESIDUE,
    )
    from strategy_analyzer_exporter_spark.registry import QUERIES

    base = QUERIES["dedup_incremental_at_rest"](spark, SF)
    tomb = QUERIES["dedup_incremental_tombstoned"](spark, SF)
    base_rows = sorted(tuple(r) for r in base.collect())
    tomb_rows = sorted(tuple(r) for r in tomb.collect())
    dead = lambda r: r[0] % DOC_TOMB_MOD == DOC_TOMB_RESIDUE  # noqa: E731
    assert any(dead(r) for r in base_rows)  # non-vacuous
    assert not any(dead(r) for r in tomb_rows)
    assert tomb_rows == [r for r in base_rows if not dead(r)]
    assert P.count_exchanges(tomb) <= P.count_exchanges(base), (
        P.physical_plan(tomb)
    )


def test_vacuumed_query_equals_tombstoned_without_antijoin(spark):
    """VERDICT r10 #4's Done-criterion: the registered vacuumed query
    answers the tombstone query's rows exactly, and its probe plan
    carries NO anti-join — the retired docs are gone from disk, not
    filtered at probe time."""
    from strategy_analyzer_exporter_spark.registry import QUERIES

    vac = QUERIES["dedup_incremental_vacuumed"](spark, SF)
    tomb = QUERIES["dedup_incremental_tombstoned"](spark, SF)
    assert sorted(tuple(r) for r in vac.collect()) == sorted(
        tuple(r) for r in tomb.collect()
    )
    vac_plan = P.physical_plan(vac)
    assert "LeftAnti" not in vac_plan, vac_plan
    assert "LeftAnti" in P.physical_plan(tomb)  # the twin still filters


def test_write_bucketed_table_tolerates_orphan_location(spark):
    """VERDICT r08 #4: a killed run's leftover warehouse directory
    (location on disk, no catalog entry) must not poison the next
    write_bucketed_table call with LOCATION_ALREADY_EXISTS."""
    from urllib.parse import urlparse

    from strategy_analyzer_exporter_spark.sinks import write_bucketed_table
    from strategy_analyzer_exporter_spark.sources.tables import load_table

    import pytest as _pytest

    table = "b_orphan_check"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    orphan = os.path.join(wh, table)
    os.makedirs(orphan, exist_ok=True)
    # a crashed table write leaves part files / _SUCCESS / _temporary
    with open(os.path.join(orphan, "part-00000-dead.snappy.parquet"), "w") as f:
        f.write("not parquet")
    open(os.path.join(orphan, "_SUCCESS"), "w").close()
    try:
        df = load_table(spark, SF, "region").select("r_regionkey", "r_name")
        write_bucketed_table(df, table, ("r_regionkey",), 2, ("r_regionkey",))
        assert spark.table(table).count() == df.count()
        # ...but an unexpectedly-named USER directory at the same spot
        # is surfaced, never silently deleted (ADVICE r09)
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        import shutil

        shutil.rmtree(orphan, ignore_errors=True)
        os.makedirs(orphan)
        keep = os.path.join(orphan, "my_precious_data.csv")
        with open(keep, "w") as f:
            f.write("1,2,3")
        with _pytest.raises(RuntimeError, match="refusing to delete"):
            write_bucketed_table(
                df, table, ("r_regionkey",), 2, ("r_regionkey",)
            )
        assert os.path.exists(keep)  # nothing was removed
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        import shutil

        shutil.rmtree(orphan, ignore_errors=True)
