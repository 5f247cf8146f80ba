"""HHmmss / yyyyMMdd integer time codecs.

The reference encodes bar timestamps as two int columns: ``Time`` is the
local time as an HHmmss integer (NinjaTrader ``ToTime``, reference
StrategyAnalyzerExporter/StrategyAnalyzerExporter.cs:207) and ``Day`` is
the date as a yyyyMMdd integer (``ToDay``, :208). All time predicates in
the reference operate on these encodings (e.g. the 090000-155500 session
filter, StrategyAnalyzerExporter.cs:128-129,189-194).

Spark-side codecs are pure integer arithmetic on ``year/month/day/
hour/minute/second`` extractions — exact, codegen'd, and identical to the
DuckDB SQL equivalents in ``sql_*`` below (used by the oracle).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Spark Column codecs


def ts_to_day(ts: Column | str) -> Column:
    """timestamp → yyyyMMdd int32 (reference ``ToDay``)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return (F.year(c) * 10000 + F.month(c) * 100 + F.dayofmonth(c)).cast("int")


def ts_to_time(ts: Column | str) -> Column:
    """timestamp → HHmmss int32 (reference ``ToTime``)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return (F.hour(c) * 10000 + F.minute(c) * 100 + F.second(c)).cast("int")


def day_to_date(day: Column | str) -> Column:
    """yyyyMMdd int → DateType."""
    c = F.col(day) if isinstance(day, str) else day
    return F.to_date(c.cast("string"), "yyyyMMdd")


def day_time_to_ts(day: Column | str, time: Column | str) -> Column:
    """(yyyyMMdd, HHmmss) ints → TimestampType."""
    d = F.col(day) if isinstance(day, str) else day
    t = F.col(time) if isinstance(time, str) else time
    return F.to_timestamp(
        F.concat(
            F.lpad(d.cast("string"), 8, "0"), F.lpad(t.cast("string"), 6, "0")
        ),
        "yyyyMMddHHmmss",
    )


def time_in_session(time: Column | str, start: int, end: int) -> Column:
    """The reference's time-of-day session predicate (P3): inclusive
    ``start <= HHmmss <= end`` (StrategyAnalyzerExporter.cs:189-194)."""
    c = F.col(time) if isinstance(time, str) else time
    return (c >= start) & (c <= end)


# ---------------------------------------------------------------------------
# DuckDB SQL fragment equivalents (oracle side)


def sql_ts_to_day(ts_expr: str) -> str:
    return (
        f"CAST(year({ts_expr})*10000 + month({ts_expr})*100 + day({ts_expr}) AS INTEGER)"
    )


def sql_ts_to_time(ts_expr: str) -> str:
    return (
        f"CAST(hour({ts_expr})*10000 + minute({ts_expr})*100 + second({ts_expr}) AS INTEGER)"
    )


# ---------------------------------------------------------------------------
# Pure-Python codecs (unit-test oracles)


def py_ts_to_day(ts: _dt.datetime) -> int:
    return ts.year * 10000 + ts.month * 100 + ts.day


def py_ts_to_time(ts: _dt.datetime) -> int:
    return ts.hour * 10000 + ts.minute * 100 + ts.second


def py_parse_hhmmss(s: str) -> int:
    """Parse "090000"-style strings like the reference's int.Parse of the
    TimeStart/TimeEnd properties (StrategyAnalyzerExporter.cs:128-129)."""
    return int(s)
