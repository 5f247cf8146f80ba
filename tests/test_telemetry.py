"""Telemetry parity (S9): batch Observation counters + streaming
listener, mirroring the reference's throughput print and
Enqueued=/Written= counters (StrategyAnalyzerExporter.cs:240-245,
ExporterDatabaseManager.cs:183-184)."""

from __future__ import annotations

import os
import time

from strategy_analyzer_exporter_spark.operators.features import (
    TESTDATA_CONFIG,
    features_df,
)
from strategy_analyzer_exporter_spark.telemetry import (
    BatchTelemetry,
    ThroughputListener,
    counters_line,
    throughput_line,
)

SF = "/root/testdata/sf0.001"
TMP = "/root/repo/.tmp"


def test_line_formats():
    assert throughput_line(12345, 2.0) == "Calculation finished: 12,345 bars in 2.0s (6,172 bars/s)."
    # zero-duration guard like the reference (max(0.0001, secs))
    assert "bars/s" in throughput_line(10, 0.0)
    assert counters_line(7, 5) == "Enqueued=7, Written=5"


def test_batch_telemetry_observes_on_the_write_job(spark):
    tel = BatchTelemetry()
    df = tel.observe_input(features_df(spark, SF, TESTDATA_CONFIG))
    out = tel.observe_output(df)
    out.write.format("noop").mode("overwrite").save()
    tel.mark_finished()
    n = features_df(spark, SF, TESTDATA_CONFIG).count()
    assert tel.enqueued == n > 0
    assert tel.written == n
    rep = tel.report()
    assert "Calculation finished:" in rep and f"Enqueued={n}, Written={n}" in rep


def test_export_to_duckdb_with_telemetry(spark, tmp_path):
    from strategy_analyzer_exporter_spark.sinks import export_to_duckdb

    tel = BatchTelemetry()
    df = tel.observe_input(features_df(spark, SF, TESTDATA_CONFIG))
    n = export_to_duckdb(
        df,
        str(tmp_path / "tel.duckdb"),
        "features",
        os.path.join(TMP, "tel_stage"),
        telemetry=tel,
    )
    assert tel.written == n == tel.enqueued > 0
    assert tel.elapsed > 0


def test_streaming_throughput_listener(spark):
    from strategy_analyzer_exporter_spark.streaming import (
        run_windowed_counts_to_memory,
    )

    lines: list[str] = []
    listener = ThroughputListener(printer=lines.append)
    spark.streams.addListener(listener)
    try:
        run_windowed_counts_to_memory(spark, SF, query_name="tel_counts")
        # listener events are delivered async — poll until rows are counted
        deadline = time.time() + 20
        while time.time() < deadline and sum(listener.totals.values()) == 0:
            time.sleep(0.2)
        total = sum(listener.totals.values())
        from strategy_analyzer_exporter_spark.sources.tables import load_table

        n_events = load_table(spark, SF, "events").count()
        assert total >= n_events  # every input row counted (≥: other queries may run)
        qid = max(listener.totals, key=listener.totals.get)
        rep = listener.report(qid)
        assert rep.startswith("Enqueued=") and "bars/s" in rep
        assert lines and "rows/s" in lines[-1]
    finally:
        spark.streams.removeListener(listener)
