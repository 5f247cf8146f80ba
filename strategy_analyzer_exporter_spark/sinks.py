"""Sinks: parquet export + DuckDB ingestion (reference §2.1 S2-S9 parity).

The reference writes row-at-a-time into DuckDB through an appender with
batched commits and periodic CHECKPOINTs (DatabaseWriter.cs:141-181,
396-464). The Spark-first equivalent splits responsibilities:

- executors write PARQUET in parallel (vectorized, atomic per job) —
  this is the distributed bulk path; DuckDB reads parquet natively, so
  a parquet directory IS a DuckDB-queryable table at rest;
- an optional driver-side INGEST step loads the parquet into a real
  .duckdb file in one `CREATE TABLE ... AS SELECT * FROM read_parquet`
  statement — columnar, transactional, and orders of magnitude faster
  than row appends;
- the streaming path (streaming/) commits per micro-batch epoch via
  foreachBatch with the reference's commit/checkpoint cadence knobs.

At 100 TB only the parquet path runs distributed; a single-file .duckdb
is inherently single-writer, so it exists for tool-compat exports of
aggregated/filtered results, not for raw fact data.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from strategy_analyzer_exporter_spark.schema import export_select, quote_ident


@dataclass(frozen=True)
class CommitPolicy:
    """Reference ingestion knobs (StrategyAnalyzerExporter.cs:110-117).

    flush_size / flush_interval_s govern micro-batch sizing upstream;
    commit_every_rows / checkpoint_every_commits govern the DuckDB
    transaction cadence in the streaming sink."""

    flush_size: int = 50_000
    flush_interval_s: int = 60
    commit_every_rows: int = 10_000
    max_tx_duration_s: int = 30
    idle_tail_commit_s: int = 15
    checkpoint_every_commits: int = 10


_SPARK_TO_DUCKDB: dict[type, str] = {
    T.StringType: "VARCHAR",
    T.BinaryType: "BLOB",
    T.BooleanType: "BOOLEAN",
    T.ByteType: "TINYINT",
    T.ShortType: "SMALLINT",
    T.IntegerType: "INTEGER",
    T.LongType: "BIGINT",
    T.FloatType: "REAL",
    T.DoubleType: "DOUBLE",
    T.DateType: "DATE",
    T.TimestampType: "TIMESTAMP",
}


def spark_schema_to_duckdb_ddl(schema: T.StructType, table: str) -> str:
    """Spark StructType → `CREATE TABLE IF NOT EXISTS` DDL (the engine-side
    twin of schema.derive_create_table, which starts from a Python record
    class like the reference's reflection path DatabaseWriter.cs:217-256)."""
    cols = []
    for f in schema.fields:
        if isinstance(f.dataType, T.DecimalType):
            d = f"DECIMAL({f.dataType.precision},{f.dataType.scale})"
        else:
            d = _SPARK_TO_DUCKDB.get(type(f.dataType), "VARCHAR")
        cols.append(f"{quote_ident(f.name)} {d}")
    return f"CREATE TABLE IF NOT EXISTS {quote_ident(table)} ({', '.join(cols)})"


def write_parquet(
    df: DataFrame,
    path: str,
    use_float32: bool = True,
    partition_by: tuple[str, ...] = (),
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
    telemetry=None,
) -> None:
    """Bulk export with the sink's column discipline: ordinal column
    order + double→float32 narrowing (S4, ≈50% size, README.md:68).

    partition_by=("day",) gives partition pruning for the reference's
    day/time predicates on read-back. max_records_per_file bounds file
    size so a 1000-executor read parallelizes.

    ``telemetry``: optional :class:`telemetry.BatchTelemetry`; the
    written row count is observed ON the write job (no extra scan),
    mirroring the reference's Written= counter (S9)."""
    out = export_select(df, use_float32=use_float32)
    if telemetry is not None:
        out = telemetry.observe_output(out)
    w = out.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int = 32,
    sort_cols: tuple[str, ...] = (),
) -> None:
    """Bucketed parquet table (saveAsTable — bucketing needs catalog
    metadata). The 100 TB co-location story: two fact tables bucketed on
    the same join key with the same bucket count join WITHOUT a shuffle —
    each task zips matching buckets. That turns the biggest recurring
    cost of fact-fact joins (full repartition of both sides) into a
    bucket-local sort-merge; with sort_cols matching the join key the
    sort disappears too. tests/test_plans.py asserts the zero-exchange
    plan.

    Orphan-location tolerance (VERDICT r08 #4): a killed run can leave
    the managed table's warehouse directory behind an EMPTY in-memory
    catalog; the next session's ``saveAsTable`` then dies with
    LOCATION_ALREADY_EXISTS. When the catalog has no entry for
    ``table`` (bare name, current database) but its managed location
    exists on disk, the orphan is removed before writing. Scope: the
    catalog consulted is the SESSION's — correct for this engine's
    in-memory-catalog test/bench fixtures (where an entry-less location
    can only be a crashed writer's leftovers), and for a shared
    metastore deployment tableExists is global so the check is sound
    there too. The one unsafe configuration is two CONCURRENT
    in-memory-catalog sessions pointing at the same warehouse and table
    name — already a broken setup (either session's overwrite clobbers
    the other); don't share a warehouse across live sessions. The
    location is resolved from the CURRENT DATABASE's locationUri (not
    the warehouse root), so non-default databases prune correctly, and
    percent-encoding in the URI is decoded before touching the
    filesystem."""
    spark = df.sparkSession
    if not spark.catalog.tableExists(table):
        import shutil
        from urllib.parse import unquote, urlparse

        try:
            db = spark.catalog.currentDatabase()
            loc = spark.catalog.getDatabase(db).locationUri
        except Exception:
            loc = spark.conf.get("spark.sql.warehouse.dir", "")
        db_path = unquote(urlparse(loc).path) or loc
        orphan = os.path.join(db_path, table.lower())
        if db_path and os.path.isdir(orphan):
            # only delete what LOOKS like a crashed table write
            # (part files / _SUCCESS / _temporary / hidden .crc):
            # an unexpectedly-named user directory under the warehouse
            # is surfaced, not silently removed; and the rmtree result
            # is checked — a partial delete must not proceed into
            # saveAsTable's LOCATION_ALREADY_EXISTS (ADVICE r09)
            unexpected = [
                e
                for e in os.listdir(orphan)
                if not (
                    e.startswith(("part-", "_", "."))
                )
            ]
            if unexpected:
                raise RuntimeError(
                    f"warehouse location {orphan!r} exists without a "
                    f"catalog entry but does not look like a crashed "
                    f"table write (unexpected entries: {unexpected[:5]}) "
                    f"— refusing to delete it; move it aside or drop "
                    f"the files explicitly"
                )
            shutil.rmtree(orphan)
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def ingest_parquet_to_duckdb(
    parquet_path: str, db_path: str, table: str, mode: str = "replace"
) -> int:
    """Load a parquet export into a .duckdb file (driver-side, bulk).
    Returns the row count. `mode`: replace | append."""
    import duckdb

    con = duckdb.connect(db_path)
    try:
        glob = os.path.join(parquet_path, "**", "*.parquet")
        if mode == "replace":
            con.execute(f"DROP TABLE IF EXISTS {quote_ident(table)}")
        con.execute(
            f"CREATE TABLE IF NOT EXISTS {quote_ident(table)} AS "
            f"SELECT * FROM read_parquet('{glob}', hive_partitioning=true) LIMIT 0"
        )
        con.execute(
            f"INSERT INTO {quote_ident(table)} "
            f"SELECT * FROM read_parquet('{glob}', hive_partitioning=true)"
        )
        n = con.execute(
            f"SELECT count(*) FROM {quote_ident(table)}"
        ).fetchone()[0]
        try:
            # S7: checkpoint on close (DatabaseWriter.cs:388-392)
            con.execute("CHECKPOINT")
        except duckdb.TransactionException:
            # another connection holds a write txn; durability is already
            # transactional — the checkpoint is only a WAL-truncation
            # optimization, so skip rather than FORCE-abort their work
            pass
        return int(n)
    finally:
        con.close()


def export_to_duckdb(
    df: DataFrame,
    db_path: str,
    table: str,
    staging_dir: str,
    use_float32: bool = True,
    telemetry=None,
) -> int:
    """End-to-end batch export (reference entry point 1, SURVEY.md §3.1):
    distributed parquet write → single bulk DuckDB ingest → CHECKPOINT.
    With ``telemetry`` set, the write job doubles as the reference's
    throughput/counter measurement (S9) — read ``telemetry.report()``
    after this returns."""
    write_parquet(df, staging_dir, use_float32=use_float32, telemetry=telemetry)
    n = ingest_parquet_to_duckdb(staging_dir, db_path, table)
    if telemetry is not None:
        telemetry.mark_finished()
    return n


def print_data_bar_sink(df: DataFrame, limit: int = 20, printer=print) -> int:
    """S10 parity: the reference's optional per-row debug print
    (EnablePrintDataBar, StrategyAnalyzerExporter.cs:218-225 — one
    ``t=…, d=…, O=…, H=…, L=…, C=…, Vol=…`` line per bar, emitted
    through EventManager.cs:5-14). Debug surface, not a correctness
    surface: rows are hard-capped at ``limit`` so pointing it at a
    100 TB relation collects k rows, never the relation. Returns the
    number of rows printed. The streaming analogue is the ``console``
    format (or a foreachBatch calling this formatter per epoch)."""
    key_map = {
        "time": "t", "day": "d", "open": "O", "high": "H",
        "low": "L", "close": "C", "volume": "Vol",
    }
    rows = df.limit(limit).collect()
    cols = df.columns
    for r in rows:
        printer(
            ", ".join(f"{key_map.get(c, c)}={r[c]}" for c in cols)
        )
    return len(rows)
