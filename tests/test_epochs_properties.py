"""Property tests for the epoch/append-log state machine
(sources/epochs.py) — pure filesystem, no Spark session.

The protocol's safety claim: ``chain_state`` must NEVER validate a
directory group in a state that could serve wrong data — torn appends
(PENDING without OK), gapped or divergent chains, or missing/resized
recorded files — while always validating the states the happy paths
produce (committed chains, compacted chains, fresh re-attach).
Hypothesis drives random interleavings of begins/commits/corruptions
against a reference model.
"""

import json
import os

from hypothesis import given, settings
from hypothesis import strategies as st

from strategy_analyzer_exporter_spark.sources import epochs


def _mk_group(tmp_path, n_dirs):
    dirs = []
    for i in range(n_dirs):
        d = os.path.join(str(tmp_path), f"d{i}")
        os.makedirs(d, exist_ok=True)
        dirs.append(d)
    return dirs


def _commit(dirs, n, pred, files_per_dir=1):
    epochs.begin_epoch(dirs, n, pred)
    added = {}
    for d in dirs:
        rel = {}
        for j in range(files_per_dir):
            name = f"part-{n:04d}-{j}.bin"
            p = os.path.join(d, name)
            with open(p, "wb") as f:
                f.write(b"x" * (10 * n + j))
            rel[name] = 10 * n + j
        added[d] = rel
    epochs.commit_epoch(dirs, n, pred, added, "fp")
    return added


@settings(max_examples=60, deadline=None)
@given(
    n_dirs=st.integers(1, 3),
    n_epochs=st.integers(0, 4),
    corruption=st.sampled_from(
        [
            "none",
            "pending",          # torn append: PENDING without OK
            "gap",              # remove an OK from the middle of the chain
            "missing_file",     # delete a recorded data file
            "resized_file",     # truncate a recorded data file
            "divergent_pred",   # one dir's OK disagrees on the predicate
            "compacted",        # rewrite_compacted (files gone, still valid)
            "orphan",           # data file accounted for by no record
        ]
    ),
    victim=st.integers(0, 10),
)
def test_chain_state_matches_reference_model(
    tmp_path_factory, n_dirs, n_epochs, corruption, victim
):
    dirs = _mk_group(tmp_path_factory.mktemp("grp"), n_dirs)
    # models the build path: every layout starts with a base record
    # (epoch 0), so the orphan check is live (VERDICT r10 #3)
    epochs.record_base(dirs)
    preds = [f"id % {k + 2} = 0" for k in range(n_epochs)]
    for k, pred in enumerate(preds, start=1):
        _commit(dirs, k, pred)

    expect_valid, expect_preds = True, list(preds)
    if corruption == "pending":
        with open(os.path.join(dirs[victim % n_dirs],
                               f"_EPOCH_{n_epochs + 1:04d}_PENDING"), "w") as f:
            f.write("{}")
        expect_valid, expect_preds = False, []
    elif corruption == "gap" and n_epochs >= 2:
        os.remove(os.path.join(dirs[victim % n_dirs], "_EPOCH_0001_OK"))
        expect_valid, expect_preds = False, []
    elif corruption == "missing_file" and n_epochs >= 1:
        k = victim % n_epochs + 1
        os.remove(os.path.join(dirs[victim % n_dirs], f"part-{k:04d}-0.bin"))
        expect_valid, expect_preds = False, []
    elif corruption == "resized_file" and n_epochs >= 1:
        k = victim % n_epochs + 1
        with open(os.path.join(dirs[victim % n_dirs], f"part-{k:04d}-0.bin"),
                  "wb") as f:
            f.write(b"y")
        expect_valid, expect_preds = False, []
    elif corruption == "divergent_pred" and n_epochs >= 1 and n_dirs >= 2:
        k = victim % n_epochs + 1
        p = os.path.join(dirs[victim % n_dirs], f"_EPOCH_{k:04d}_OK")
        with open(p) as f:
            rec = json.load(f)
        rec["pred"] = "id % 997 = 13"
        with open(p, "w") as f:
            json.dump(rec, f)
        expect_valid, expect_preds = False, []
    elif corruption == "compacted":
        for d in dirs:
            # compaction replaces the data files and re-marks epochs
            for f in list(os.listdir(d)):
                if f.startswith("part-"):
                    os.remove(os.path.join(d, f))
            with open(os.path.join(d, "part-0000-c.bin"), "wb") as f:
                f.write(b"compacted")
            epochs.rewrite_compacted(d)
        # still valid: compacted epochs skip the file check, and the
        # re-snapshot base record accounts for the compacted file
    elif corruption == "orphan":
        # an out-of-band writer's file: present on disk, recorded by
        # neither the base nor any epoch — must fail validation
        with open(os.path.join(dirs[victim % n_dirs], "part-9999-x.bin"),
                  "wb") as f:
            f.write(b"orphan")
        expect_valid, expect_preds = False, []

    ok, got_preds = epochs.chain_state(dirs)
    assert ok == expect_valid, (corruption, n_dirs, n_epochs)
    assert got_preds == expect_preds


def test_second_appender_collides_on_pending(tmp_path):
    """VERDICT r10 #3's concurrent-writer story: PENDING markers are
    created O_EXCL, so a second appender that raced to the same epoch
    number fails loudly BEFORE writing any data — and the chain is
    left torn (two writers did race), forcing rebuild."""
    import pytest

    dirs = _mk_group(tmp_path, 2)
    epochs.record_base(dirs)
    _commit(dirs, 1, "id % 2 = 0")
    epochs.begin_epoch(dirs, 2, "id % 3 = 0")  # appender A in flight
    with pytest.raises(RuntimeError, match="already claimed"):
        epochs.begin_epoch(dirs, 2, "id % 5 = 0")  # appender B loses
    assert epochs.chain_state(dirs) == (False, [])  # torn → rebuild


def test_ensure_base_adopts_legacy_layout(tmp_path):
    """Layouts staged before the base record: first successful attach
    adopts (current files − epoch-recorded files) as the base, after
    which orphan detection is active — no rebuild, no silent hole
    left open forever."""
    dirs = _mk_group(tmp_path, 1)
    d = dirs[0]
    # legacy build: base data files but NO epoch-0 record
    with open(os.path.join(d, "part-base-0.bin"), "wb") as f:
        f.write(b"base")
    _commit(dirs, 1, "id % 2 = 0")
    assert epochs.chain_state(dirs) == (True, ["id % 2 = 0"])
    epochs.ensure_base(dirs)  # the attach-path upgrade
    with open(os.path.join(d, "_EPOCH_0000_OK")) as f:
        rec = json.load(f)
    assert rec["base"] and list(rec["files"]) == ["part-base-0.bin"]
    assert epochs.chain_state(dirs) == (True, ["id % 2 = 0"])
    epochs.ensure_base(dirs)  # idempotent
    # protection is live from here: an orphan now fails validation
    with open(os.path.join(d, "part-9999-x.bin"), "wb") as f:
        f.write(b"orphan")
    assert epochs.chain_state(dirs) == (False, [])


def test_vacuum_manifest_roundtrip(tmp_path):
    """ADVICE r10: vacuums are declared state — recorded in order,
    read back exactly, absent by default, and poison (unreadable
    manifest) never matches any expectation."""
    dirs = _mk_group(tmp_path, 1)
    d = dirs[0]
    assert epochs.vacuum_state(d) == []
    epochs.record_vacuum(d, "id % 7 = 1")
    epochs.record_vacuum(d, "id % 11 = 3")
    assert epochs.vacuum_state(d) == ["id % 7 = 1", "id % 11 = 3"]
    with open(os.path.join(d, "_VACUUMED"), "w") as f:
        f.write("not json")
    assert epochs.vacuum_state(d) == ["<unreadable _VACUUMED>"]


def test_commit_clears_pending_and_records_rows(tmp_path):
    dirs = _mk_group(tmp_path, 2)
    _commit(dirs, 1, "id % 2 = 0", files_per_dir=2)
    for d in dirs:
        assert not os.path.exists(os.path.join(d, "_EPOCH_0001_PENDING"))
        with open(os.path.join(d, "_EPOCH_0001_OK")) as f:
            rec = json.load(f)
        assert rec["pred"] == "id % 2 = 0" and len(rec["files"]) == 2
        # non-parquet test payloads: parquet_rows records -1 (unreadable
        # footer) rather than failing the commit — counts are
        # informational, validation never reads data files' contents
        assert rec["rows"] == -1


def test_data_files_skips_hidden(tmp_path):
    d = str(tmp_path)
    for name in ("part-1.bin", "_SUCCESS", ".crc", "_EPOCH_0001_OK"):
        with open(os.path.join(d, name), "w") as f:
            f.write("x")
    os.makedirs(os.path.join(d, "_temporary"))
    with open(os.path.join(d, "_temporary", "part-2.bin"), "w") as f:
        f.write("x")
    assert list(epochs.data_files(d)) == ["part-1.bin"]


@settings(max_examples=60, deadline=None)
@given(
    n_dirs=st.integers(1, 3),
    n_epochs=st.integers(0, 3),
    torn_files=st.integers(0, 3),
    tear_all_dirs=st.booleans(),
)
def test_recover_torn_epoch_restores_chain_and_keeps_committed_files(
    tmp_path_factory, n_dirs, n_epochs, torn_files, tear_all_dirs
):
    """After a random committed history + a random tear of the NEXT
    epoch (PENDING in some or all dirs, 0..k partial data files),
    recover_torn_epoch(pred) must: restore a VALID chain with the
    committed predicates intact, delete every torn file, and keep
    every committed file byte-for-byte — the exactly-once retry
    contract under arbitrary crash points."""
    tmp_path = tmp_path_factory.mktemp("recover")
    dirs = _mk_group(tmp_path, n_dirs)
    committed = {}
    for n in range(1, n_epochs + 1):
        committed.update(
            {
                (d, rel): sz
                for d, rels in _commit(dirs, n, f"p{n}").items()
                for rel, sz in rels.items()
            }
        )
    epochs.record_base(dirs)  # recovery requires the orphan contract
    pred = "p_torn"
    torn_dirs = dirs if tear_all_dirs else dirs[:1]
    epochs.begin_epoch(torn_dirs, n_epochs + 1, pred)
    torn = []
    for j in range(torn_files):
        p = os.path.join(torn_dirs[j % len(torn_dirs)], f"torn-{j}.bin")
        with open(p, "wb") as f:
            f.write(b"t" * (7 + j))
        torn.append(p)
    assert not epochs.chain_state(dirs)[0]
    assert epochs.recover_torn_epoch(dirs, pred) is True
    ok, preds = epochs.chain_state(dirs)
    assert ok and preds == [f"p{n}" for n in range(1, n_epochs + 1)]
    for p in torn:
        assert not os.path.exists(p)
    for (d, rel), sz in committed.items():
        assert os.stat(os.path.join(d, rel)).st_size == sz


def _half_commit(dirs, committed_dirs, n, pred, files_per_dir=1):
    """Append data in every dir but run ``commit_epoch`` only over
    ``committed_dirs`` — the crash point mid the OK-writing loop —
    then restore the PENDINGs commit_epoch removed in those dirs (the
    real crash happens BEFORE the removal loop, which only starts once
    every OK is written)."""
    epochs.begin_epoch(dirs, n, pred)
    added = {}
    for d in dirs:
        rel = {}
        for j in range(files_per_dir):
            name = f"part-{n:04d}-{j}.bin"
            with open(os.path.join(d, name), "wb") as f:
                f.write(b"x" * (10 * n + j))
            rel[name] = 10 * n + j
        added[d] = rel
    epochs.commit_epoch(committed_dirs, n, pred, added, "fp")
    for d in committed_dirs:
        with open(os.path.join(d, f"_EPOCH_{n:04d}_PENDING"), "x") as f:
            json.dump({"pred": pred}, f)
    return added


def test_recover_mid_commit_rolls_backward_group_wide(tmp_path):
    """ADVICE r11: a crash between per-dir OK writes used to leave the
    committed OK alive in one dir while recovery deleted the data in
    the others — a permanently disagreeing chain. Now the group rolls
    BACKWARD together: the half-written OK and its files go too, and
    the retry appends cleanly."""
    dirs = _mk_group(tmp_path, 3)
    _commit(dirs, 1, "p1")
    epochs.record_base(dirs)
    _half_commit(dirs, dirs[:1], 2, "mine")
    assert not epochs.chain_state(dirs)[0]
    assert epochs.recover_torn_epoch(dirs, "mine") is True
    ok, preds = epochs.chain_state(dirs)
    assert ok and preds == ["p1"]
    for d in dirs:
        assert not os.path.exists(os.path.join(d, "part-0002-0.bin"))
        assert not os.path.exists(os.path.join(d, "_EPOCH_0002_OK"))
    # the retry contract: the same predicate now appends cleanly
    _commit(dirs, 2, "mine")
    assert epochs.chain_state(dirs) == (True, ["p1", "mine"])


def test_recover_mid_pending_removal_rolls_forward(tmp_path):
    """Crash after every OK was written but before the PENDING-removal
    loop finished: the commit's decision point passed, so recovery
    FINISHES it — markers go, data and the committed epoch stay."""
    dirs = _mk_group(tmp_path, 2)
    _commit(dirs, 1, "p1")
    epochs.record_base(dirs)
    added = _commit(dirs, 2, "mine")
    # resurrect dir 1's PENDING: the removal loop died halfway
    with open(os.path.join(dirs[1], "_EPOCH_0002_PENDING"), "x") as f:
        json.dump({"pred": "mine"}, f)
    assert not epochs.chain_state(dirs)[0]
    assert epochs.recover_torn_epoch(dirs, "mine") is True
    ok, preds = epochs.chain_state(dirs)
    assert ok and preds == ["p1", "mine"]
    for d, rels in added.items():
        for rel, sz in rels.items():
            assert os.stat(os.path.join(d, rel)).st_size == sz


def test_recover_refuses_racer_committed_slot(tmp_path):
    """A stale PENDING claim on a slot a racer has since committed
    with a DIFFERENT predicate is not ours to roll back — raises."""
    dirs = _mk_group(tmp_path, 1)
    _commit(dirs, 1, "p1")
    epochs.record_base(dirs)
    _commit(dirs, 2, "theirs")
    with open(os.path.join(dirs[0], "_EPOCH_0002_PENDING"), "x") as f:
        json.dump({"pred": "mine"}, f)
    import pytest

    with pytest.raises(RuntimeError, match="racer took the slot"):
        epochs.recover_torn_epoch(dirs, "mine")


def test_recover_refuses_foreign_pred_and_missing_base(tmp_path):
    dirs = _mk_group(tmp_path, 2)
    _commit(dirs, 1, "p1")
    epochs.record_base(dirs)
    epochs.begin_epoch(dirs, 2, "mine")
    import pytest

    with pytest.raises(RuntimeError, match="someone else's tear"):
        epochs.recover_torn_epoch(dirs, "theirs")
    # and without the base record the primitive must refuse outright
    # (unaccounted files would be indistinguishable from the base)
    for d in dirs:
        os.remove(os.path.join(d, "_EPOCH_0000_OK"))
    with pytest.raises(RuntimeError, match="no base record"):
        epochs.recover_torn_epoch(dirs, "mine")


def test_recover_validates_before_any_mutation_missing_base(tmp_path):
    """ADVICE r12: a half-committed epoch in a group LACKING the base
    record must raise with the on-disk state UNTOUCHED — the old code
    rolled the half-commit back (deleting the OK record and its data
    files) before pass 3's base-record check fired, leaving a state
    different from the one the error message implies."""
    import pytest

    dirs = _mk_group(tmp_path, 2)
    _commit(dirs, 1, "p1")
    epochs.record_base(dirs)
    _half_commit(dirs, dirs[:1], 2, "mine")
    for d in dirs:  # no base record anywhere → must refuse outright
        os.remove(os.path.join(d, "_EPOCH_0000_OK"))
    with pytest.raises(RuntimeError, match="no base record"):
        epochs.recover_torn_epoch(dirs, "mine")
    # nothing was rolled back: the half-committed OK, its data file,
    # and every PENDING marker are exactly where the tear left them
    assert os.path.exists(os.path.join(dirs[0], "_EPOCH_0002_OK"))
    assert os.path.exists(os.path.join(dirs[0], "part-0002-0.bin"))
    for d in dirs:
        assert os.path.exists(os.path.join(d, "_EPOCH_0002_PENDING"))


def test_recover_validates_before_any_mutation_racer_after_forward(tmp_path):
    """Second pre-mutation scenario: torn epoch 2 would roll FORWARD
    (group-wide OK), but torn epoch 3's slot was committed by a racer
    — the raise must leave epoch 2's PENDING markers in place (the old
    per-epoch loop executed the forward roll first)."""
    import pytest

    dirs = _mk_group(tmp_path, 2)
    _commit(dirs, 1, "p1")
    epochs.record_base(dirs)
    _commit(dirs, 2, "mine")
    for d in dirs:  # mid-removal crash: every OK written, PENDINGs stay
        with open(os.path.join(d, "_EPOCH_0002_PENDING"), "x") as f:
            json.dump({"pred": "mine"}, f)
    _commit(dirs, 3, "theirs")
    for d in dirs:  # stale claim on the racer-committed slot
        with open(os.path.join(d, "_EPOCH_0003_PENDING"), "x") as f:
            json.dump({"pred": "mine"}, f)
    with pytest.raises(RuntimeError, match="racer took the slot"):
        epochs.recover_torn_epoch(dirs, "mine")
    for d in dirs:
        assert os.path.exists(os.path.join(d, "_EPOCH_0002_PENDING"))
        assert os.path.exists(os.path.join(d, "_EPOCH_0003_PENDING"))
