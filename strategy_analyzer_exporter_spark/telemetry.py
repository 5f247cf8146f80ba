"""Telemetry parity with the reference exporter (S9, SURVEY.md §2.5).

The reference prints two kinds of counters while exporting:
- a throughput line when the historical calculation finishes —
  ``"Calculation finished: {N:N0} bars in {secs:N1}s ({rate:N0}
  bars/s)."`` (StrategyAnalyzerExporter.cs:240-245);
- queue counters on finalize — ``Enqueued={n}`` / ``Written={m}``
  (ExporterDatabaseManager.cs:183-184).

Spark-first equivalents, both zero-cost on the data path:
- batch: ``DataFrame.observe`` with an :class:`~pyspark.sql.Observation`
  — metrics ride the existing job (no extra scan, no collect) and are
  read on the driver after the action;
- streaming: a :class:`~pyspark.sql.streaming.listener.StreamingQueryListener`
  aggregating per-batch ``numInputRows`` and emitting the reference's
  print format per progress event.

At 100 TB both mechanisms stay driver-side constants: observed metrics
are partial-aggregated with the job, and the listener only sees progress
summaries.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.streaming.listener import StreamingQueryListener


def throughput_line(n_rows: int, secs: float, what: str = "bars") -> str:
    """The reference's historical-timing print, same shape and guards
    (StrategyAnalyzerExporter.cs:240-245: rate guards secs >= 0.0001)."""
    secs_g = max(0.0001, secs)
    rate = n_rows / secs_g
    return f"Calculation finished: {n_rows:,} {what} in {secs:.1f}s ({rate:,.0f} {what}/s)."


def counters_line(enqueued: int, written: int) -> str:
    """The reference's finalize counters (ExporterDatabaseManager.cs:183-184)."""
    return f"Enqueued={enqueued}, Written={written}"


@dataclass
class BatchTelemetry:
    """Observation-based rows-in/rows-out for a batch export.

    Usage::

        tel = BatchTelemetry()
        df = tel.observe_input(df)      # before the sink projection
        out = tel.observe_output(out)   # the exported frame
        out.write...                    # one action drives both
        tel.enqueued, tel.written, tel.report()
    """

    _obs_in: Observation | None = field(default=None, repr=False)
    _obs_out: Observation | None = field(default=None, repr=False)
    started: float = field(default_factory=time.perf_counter)
    finished: float | None = None

    def observe_input(self, df: DataFrame) -> DataFrame:
        self._obs_in = Observation("telemetry_in")
        return df.observe(self._obs_in, F.count(F.lit(1)).alias("rows"))

    def observe_output(self, df: DataFrame) -> DataFrame:
        self._obs_out = Observation("telemetry_out")
        return df.observe(self._obs_out, F.count(F.lit(1)).alias("rows"))

    def mark_finished(self) -> None:
        self.finished = time.perf_counter()

    @property
    def enqueued(self) -> int:
        return int(self._obs_in.get["rows"]) if self._obs_in else 0

    @property
    def written(self) -> int:
        return int(self._obs_out.get["rows"]) if self._obs_out else 0

    @property
    def elapsed(self) -> float:
        return (self.finished or time.perf_counter()) - self.started

    def report(self, what: str = "bars") -> str:
        return (
            throughput_line(self.written, self.elapsed, what)
            + " "
            + counters_line(self.enqueued, self.written)
        )


class ThroughputListener(StreamingQueryListener):
    """StreamingQueryListener mirroring the reference's running
    throughput counters. Tracks per-query totals of ``numInputRows`` and
    the latest processing rate; ``report(query_id)`` prints the
    reference format. Instantiate then ``spark.streams.addListener``."""

    def __init__(self, printer: Callable[[str], None] | None = None):
        self.totals: dict[str, int] = {}
        self.last_rate: dict[str, float] = {}
        self.batches: dict[str, int] = {}
        self._printer = printer

    def onQueryStarted(self, event) -> None:
        self.totals.setdefault(str(event.id), 0)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        qid = str(p.id)
        self.totals[qid] = self.totals.get(qid, 0) + int(p.numInputRows)
        self.batches[qid] = self.batches.get(qid, 0) + 1
        rate = float(p.processedRowsPerSecond or 0.0)
        self.last_rate[qid] = rate
        if self._printer is not None:
            self._printer(
                f"batch={p.batchId} rows={p.numInputRows} "
                f"total={self.totals[qid]} rate={rate:,.0f} rows/s"
            )

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass

    def report(self, qid: str, what: str = "bars") -> str:
        total = self.totals.get(qid, 0)
        rate = self.last_rate.get(qid, 0.0)
        return f"{counters_line(total, total)} ({rate:,.0f} {what}/s)"
