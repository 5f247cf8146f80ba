"""bench.py record-demotion guard (VERDICT r12 wrong #2): a
host-smeared run must never silently overwrite an idle-comparable
BENCH_FULL.json — the exact clobber the r12 driver re-run performed on
the committed record. Pure-python: the guard is path selection, no
Spark session involved."""

from __future__ import annotations

import json
import os

import bench


def _write(path: str, run_kind: str) -> None:
    with open(path, "w") as f:
        json.dump({"run_kind": run_kind, "value": 1.0}, f)


def test_smeared_run_never_demotes_idle_record(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    primary = str(tmp_path / "BENCH_FULL.json")
    _write(primary, "idle-comparable")
    got = bench.full_record_path(str(tmp_path), "host-smeared")
    assert got == str(tmp_path / "BENCH_FULL.host-smeared.json")
    # the idle record survives untouched
    assert json.load(open(primary))["run_kind"] == "idle-comparable"


def test_idle_run_takes_primary_slot(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    primary = str(tmp_path / "BENCH_FULL.json")
    # over a smeared record AND over an idle record: same-or-better
    # quality always lands in the primary slot
    for existing in ("host-smeared", "idle-comparable"):
        _write(primary, existing)
        assert bench.full_record_path(str(tmp_path), "idle-comparable") == primary


def test_smeared_over_smeared_or_absent_is_fine(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    primary = str(tmp_path / "BENCH_FULL.json")
    # no existing record → primary
    assert bench.full_record_path(str(tmp_path), "host-smeared") == primary
    # smeared over smeared → primary (no quality demotion)
    _write(primary, "host-smeared")
    assert bench.full_record_path(str(tmp_path), "host-smeared") == primary
    # unreadable record → primary (nothing provably demoted)
    with open(primary, "w") as f:
        f.write("{not json")
    assert bench.full_record_path(str(tmp_path), "host-smeared") == primary


def test_force_env_overrides_guard(tmp_path, monkeypatch):
    primary = str(tmp_path / "BENCH_FULL.json")
    _write(primary, "idle-comparable")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FORCE", "1")
    assert bench.full_record_path(str(tmp_path), "host-smeared") == primary
