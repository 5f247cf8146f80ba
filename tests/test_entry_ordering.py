"""Driver-contract ordering: queries() must front-load every registered
query that has no CORRECTNESS row from any prior round, so the
driver's bounded per-round sample (50 as of r02) accumulates coverage
instead of resampling the same prefix."""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as E

REPO = os.path.dirname(os.path.abspath(E.__file__))


def test_unseen_queries_come_first():
    names = list(E.queries())
    seen: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        seen.update(json.load(open(path)).keys())
    unseen_positions = [i for i, n in enumerate(names) if n not in seen]
    seen_positions = [i for i, n in enumerate(names) if n in seen]
    if unseen_positions and seen_positions:
        assert max(unseen_positions) < min(seen_positions), (
            "recorded queries appear before unrecorded ones"
        )


def test_every_query_resolvable():
    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs)
    # every registered query is value-checkable (r04: the decode stub is
    # retired from the registry, agg_approx_distinct emits its accuracy
    # contract as a checkable boolean)
    assert set(qs) == set(osql)


def test_changed_this_round_names_are_registered():
    """A stale name in CHANGED_THIS_ROUND would silently drop out of the
    priority band (queries() filters on membership) — catch typos and
    renames at test time."""
    import strategy_analyzer_exporter_spark.registry as R

    assert set(E.CHANGED_THIS_ROUND) <= set(R.QUERIES)


def test_seen_tail_orders_stalest_record_first():
    """Recorded queries must be periodically re-sampled: the seen tail
    is ordered by latest-recorded-round ascending (name tiebreak), so
    the driver's 50 slots always re-verify the stalest records and
    every registered query is re-verified at least every
    ⌈registry/50⌉ rounds (r07 — replaces the alphabetical rotation,
    which needed two rounds to drain a 26-query stale tail). Queries
    re-implemented this round still jump the queue — their recorded
    rows are stale by construction."""
    seen, _rounds, failing = E._recorded_names()
    names = list(E.queries())
    changed = [
        n
        for n in E.CHANGED_THIS_ROUND
        if 0 < seen.get(n, 0) < E.CHANGED_AS_OF_ROUND
    ]
    changed += sorted(
        n for n in failing if n in names and n in seen and n not in changed
    )
    tail = [n for n in names if n in seen]
    assert tail[: len(changed)] == changed
    rotated = tail[len(changed) :]
    expected = sorted(
        (n for n in seen if n in names and n not in changed),
        key=lambda n: (seen[n], n),
    )
    assert rotated == expected
    # the ordering is actually by record age, not alphabetical
    rounds_in_order = [seen[n] for n in rotated]
    assert rounds_in_order == sorted(rounds_in_order)


def test_latest_fail_row_joins_priority_band(tmp_path, monkeypatch):
    """A query whose LATEST recorded row is a FAIL must jump the
    rotation queue (VERDICT r05 #5) — and a later green row must clear
    the flag. Also: files whose names don't match CORRECTNESS_r(\\d+)
    are skipped entirely (ADVICE r05), keeping their queries in the
    never-recorded fresh band instead of a round-0 limbo."""
    good = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    bad = {**good, "hash_match": False}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"alpha": bad, "beta": good})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({"beta": bad}))
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({"beta": good}))
    # malformed round name: must be ignored, NOT mapped to round 0
    (tmp_path / "CORRECTNESS_rFINAL.json").write_text(json.dumps({"gamma": good}))
    monkeypatch.setattr(
        E.glob,
        "glob",
        lambda _pat: sorted(str(p) for p in tmp_path.glob("CORRECTNESS_r*")),
    )
    seen, rounds, failing = E._recorded_names()
    assert rounds == 3
    assert failing == {"alpha"}  # beta recovered in r03; gamma never counted
    assert "gamma" not in seen


def test_failing_names_precede_the_rotated_tail():
    """Independent of how queries() builds its bands: every registered
    query whose latest REAL recorded row is a FAIL must appear before
    every seen query that is neither failing nor changed-this-round —
    i.e. the failing band actually jumps the rotation queue."""
    import strategy_analyzer_exporter_spark.registry as R

    seen, _rounds, failing = E._recorded_names()
    names = list(E.queries())
    pos = {n: i for i, n in enumerate(names)}
    priority = (set(E.CHANGED_THIS_ROUND) | failing) & set(R.QUERIES)
    plain_seen = [n for n in names if n in seen and n not in priority]
    for f in failing & set(R.QUERIES):
        assert all(pos[f] < pos[p] for p in plain_seen), f
