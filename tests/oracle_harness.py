"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its DuckDB oracle over the same
parquet tables and compares row count, column names/order-insensitive
schema, and values (rows sorted by every column, exact equality for
ints/strings, bit-exact-first-then-ulp-report for floats). Mirrors the
driver contract in ``__spark_entry__`` so a green run here means the
per-round CORRECTNESS gate should also be green.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_con(sf_dir: str = SF_DIR) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


_NULL = "\x00<NULL>"


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if not pd.api.types.is_float_dtype(df[c]) and not pd.api.types.is_datetime64_any_dtype(df[c]):
            if df[c].isna().any():
                df[c] = df[c].astype(object).where(pd.notna(df[c]), _NULL)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_df, oracle_sql: str, sf_dir: str = SF_DIR) -> dict:
    """Returns {'ok': bool, 'detail': str} comparing query vs oracle."""
    got = _normalize(spark_df.toPandas())
    con = duckdb_con(sf_dir)
    want = _normalize(con.execute(oracle_sql).fetchdf())
    con.close()

    if list(got.columns) != list(want.columns):
        return {"ok": False, "detail": f"columns {list(got.columns)} != {list(want.columns)}"}
    if len(got) != len(want):
        return {"ok": False, "detail": f"rowcount {len(got)} != {len(want)}"}

    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ga = g.astype("float64").to_numpy()
            wa = w.astype("float64").to_numpy()
            exact = 0
            worst = 0.0
            for x, y in zip(ga, wa):
                if (math.isnan(x) and math.isnan(y)) or x == y:
                    exact += 1
                else:
                    d = abs(x - y) / max(abs(x), abs(y), 1e-30)
                    worst = max(worst, d)
            if exact != len(ga):
                return {
                    "ok": False,
                    "detail": f"col {c}: {len(ga)-exact}/{len(ga)} rows differ, worst rel {worst:.3e}",
                }
        else:
            eq = (g.astype(object).where(pd.notna(g), None) ==
                  w.astype(object).where(pd.notna(w), None))
            if not bool(eq.all()):
                bad = int((~eq).sum())
                i = int((~eq).idxmax())
                return {
                    "ok": False,
                    "detail": f"col {c}: {bad} rows differ, e.g. {g.iloc[i]!r} != {w.iloc[i]!r}",
                }
    # dtype check (schema-ish): report but don't fail on plain width diffs
    dt = {c: (str(got[c].dtype), str(want[c].dtype)) for c in got.columns
          if str(got[c].dtype) != str(want[c].dtype)}
    return {"ok": True, "detail": f"dtypes differ (values equal): {dt}" if dt else "exact"}
