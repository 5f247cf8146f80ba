"""CLI entry point + S10 debug-print sink."""

from __future__ import annotations


def test_cli_list_prints_registry(capsys):
    from strategy_analyzer_exporter_spark.__main__ import main
    from strategy_analyzer_exporter_spark.registry import QUERIES

    assert main(["list"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert set(out) == set(QUERIES)


def test_cli_unknown_query_errors():
    from strategy_analyzer_exporter_spark.__main__ import main

    assert main(["run", "no_such_query"]) == 2


def test_print_sink_formats_bar_fields_and_caps_rows(spark):
    """S10 parity: reference-shaped `t=…, d=…, O=…` lines
    (StrategyAnalyzerExporter.cs:221-225), hard row cap so the sink can
    never collect a full relation."""
    from strategy_analyzer_exporter_spark.sinks import print_data_bar_sink
    from strategy_analyzer_exporter_spark.sources.bars import bars_df

    b = bars_df(spark, "/root/testdata/sf0.001").orderBy("day", "time")
    lines: list[str] = []
    n = print_data_bar_sink(
        b.select("time", "day", "open", "high", "low", "close", "volume"),
        limit=5,
        printer=lines.append,
    )
    assert n == 5 and len(lines) == 5
    assert lines[0].startswith("t=") and ", d=" in lines[0]
    for key in ("O=", "H=", "L=", "C=", "Vol="):
        assert key in lines[0]
