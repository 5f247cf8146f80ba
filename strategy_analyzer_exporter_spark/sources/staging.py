"""Scratch-staging helpers shared by the format-roundtrip queries and
the streaming harnesses.

``staging_root`` honors ``SPARK_GRAFT_TMP_DIR`` (deployments point it
at fast local disk or per-job scratch) and falls back to a per-user
tempdir — never a path hardcoded to one container layout.

``stage_days_ordered`` stages a DataFrame as ONE file per day with
STRICTLY INCREASING file mtimes. Spark's FileStreamSource orders files
by (mtime, path); parquet task-completion mtimes are otherwise
arbitrary, so a watermark-bearing stream reading multi-part output with
``maxFilesPerTrigger=1`` can process a late-day file first and then
silently drop older days as late data once the watermark advances
(ADVICE r03, medium). Forcing chronological mtimes makes the staged
stream a valid event-time replay: the watermark can never advance past
unprocessed data.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def staging_root() -> str:
    root = os.environ.get("SPARK_GRAFT_TMP_DIR")
    if not root:
        import tempfile

        root = os.path.join(tempfile.gettempdir(), "spark_graft_staging")
    os.makedirs(root, exist_ok=True)
    return root


def stage_days_ordered(df: DataFrame, stage: str, day_col: str = "day") -> None:
    """Write ``df`` under ``stage/day_NNNN/`` (one parquet file per
    day, chronological, mtimes forced increasing). Idempotent via a
    ``_STAGED_OK`` flag. ``day_col`` is kept in the output columns iff
    it is in ``df`` — callers choose their projection before staging."""
    flag = os.path.join(stage, "_STAGED_OK")
    if os.path.exists(flag):
        return
    days = [
        r[0] for r in df.select(day_col).distinct().orderBy(day_col).collect()
    ]
    for i, day in enumerate(days):
        (
            df.filter(F.col(day_col) == F.lit(day))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(stage, f"day_{i:04d}"))
        )
    t0 = time.time() - 86400
    for i in range(len(days)):
        d = os.path.join(stage, f"day_{i:04d}")
        for f in sorted(os.listdir(d)):
            os.utime(os.path.join(d, f), (t0 + i, t0 + i))
    open(flag, "w").close()


def staging_suffix(*parts: object) -> str:
    """Short stable suffix for a staging dir/table name derived from the
    given key parts (shared by the bucketed tables and media-file
    staging so the keying scheme lives in one place)."""
    import hashlib

    return hashlib.md5(":".join(str(p) for p in parts).encode()).hexdigest()[:8]
