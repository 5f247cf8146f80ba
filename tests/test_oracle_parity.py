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
    # r04: every registered query carries a full value oracle
    assert set(QUERIES) == set(ORACLES)


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
