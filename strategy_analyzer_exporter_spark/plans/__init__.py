"""Physical-plan inspection helpers.

Scale regressions rarely show up at test scale factors — a lost filter
pushdown or a sort-merge join where a broadcast belongs runs fine on 60k
rows and melts at 100 TB. These helpers make plan shape assertable in
tests (tests/test_plans.py) the way values are assertable against the
DuckDB oracle.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (excluding broadcast exchanges and
    AQE-reused ones) — the number that must stay flat as operators are
    added to a shared-partitioning pipeline."""
    plan = physical_plan(df)
    total = len(re.findall(r"\bExchange hashpartitioning", plan))
    reused = len(re.findall(r"\bReusedExchange", plan))
    return total - 0 * reused  # reused exchanges print separately


def count_broadcast_joins(df: DataFrame) -> int:
    return physical_plan(df).count("BroadcastHashJoin")


def count_sort_merge_joins(df: DataFrame) -> int:
    return physical_plan(df).count("SortMergeJoin")


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan in the plan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", physical_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every parquet scan — asserts column pruning."""
    return re.findall(r"ReadSchema: struct<([^>]*)>", physical_plan(df))


def count_unpartitioned_windows(df: DataFrame) -> int:
    """Window expressions with an EMPTY partition spec — the single-task
    global-sort/agg shape that melts at scale. Parses every
    ``windowspecdefinition(part..., order..., frame)`` in the plan:
    order args carry ASC/DESC markers and the frame arg is a
    ``specifiedwindowframe`` — a spec with NO remaining (partition)
    args is unpartitioned. Constant-key windows over k-row relations
    (functions/topk.py) keep their ``lit(0)`` partition because
    session.py excludes Spark 4's EliminateWindowPartitions rule, so
    they do not count."""
    plan = physical_plan(df)
    n = 0
    marker = "windowspecdefinition("
    i = 0
    while True:
        i = plan.find(marker, i)
        if i < 0:
            break
        j = i + len(marker)
        depth = 1
        args: list[str] = []
        cur = []
        while j < len(plan) and depth:
            ch = plan[j]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if not depth:
                    break
            elif ch == "," and depth == 1:
                args.append("".join(cur).strip())
                cur = []
                j += 1
                continue
            cur.append(ch)
            j += 1
        if cur:
            args.append("".join(cur).strip())
        part = [
            a
            for a in args
            if not a.startswith("specifiedwindowframe")
            and " ASC NULLS" not in a
            and " DESC NULLS" not in a
        ]
        if not part:
            n += 1
        i = j
    return n


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """True if the plan compiles whole-stage-codegen subtrees. Uses
    codegen-mode explain (AQE plans don't print codegen markers in the
    plain plan string until finalized)."""
    s = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    return "WholeStageCodegen" in s
