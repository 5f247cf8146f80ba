"""Guard against vacuously-green gate queries (r11).

The driver's correctness gate compares Spark vs DuckDB row-for-row — a
query whose predicate never fires on the gate corpus "passes" on 0 == 0
while checking nothing. That happened FOUR times before this guard:
join_anti / q22 ("customers with no orders" — every synthetic customer
has orders), q11 (fixed 0.002 revenue fraction — unreachable once the
corpus has > 500 parts), and dedup_embedding_cosine (cos ≥ 0.98 over
near-orthogonal synthetic embeddings, max real pair ≈ 0.44): all four
matched their oracles on zero rows from r01 until the r11 audit.

Every oracle must return ≥ 1 row at the suite corpus, with an explicit
allowlist for queries that are legitimately sparse at sf0.001 but
verified non-vacuous at the driver's sf0.01 gate.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as E
from oracle_harness import duckdb_con

SF_DIR_SMALL = "/root/testdata/sf0.001"

# zero rows at sf0.001 is expected AND the sf0.01 gate is non-vacuous
# (audited r11): the tiny corpus simply lacks the nation-pair flow
ALLOW_EMPTY_AT_SF0001 = {"q7_volume_shipping"}


@pytest.fixture(scope="module")
def con() -> duckdb.DuckDBPyConnection:
    return duckdb_con(SF_DIR_SMALL)


@pytest.mark.parametrize("name", sorted(E.oracle_sql()))
def test_oracle_is_not_vacuous(con, name):
    if name in ALLOW_EMPTY_AT_SF0001:
        pytest.skip("legitimately sparse at sf0.001; audited at sf0.01")
    n = len(con.execute(E.oracle_sql()[name]).fetchall())
    assert n >= 1, (
        f"{name}: oracle returns 0 rows at sf0.001 — the gate would be "
        f"comparing nothing; recalibrate the predicate to the corpus or "
        f"allowlist it with an sf0.01 audit"
    )
