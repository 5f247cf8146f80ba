"""Driver-contract parity: every registered query vs its DuckDB oracle
at sf0.001 (the full sf0.01 gate is the driver's job; this keeps the
suite fast while catching regressions in both implementations)."""

import pytest

import __spark_entry__ as E
from oracle_harness import compare

SF = "/root/testdata/sf0.001"

QUERIES = E.queries()
ORACLES = E.oracle_sql()


def test_every_query_has_callable():
    assert len(QUERIES) >= 40
    missing_oracles = set(QUERIES) - set(ORACLES)
    # only genuinely non-SQL-expressible ops may omit the oracle
    assert missing_oracles <= {"agg_approx_distinct", "multimodal_decode_stub",
                               "streaming_features", "ema_full_series"}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF)
    if name not in ORACLES:
        assert df.count() >= 0
        return
    r = compare(df, ORACLES[name], sf_dir=SF)
    assert r["ok"], f"{name}: {r['detail']}"


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
