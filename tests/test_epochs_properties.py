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
        ]
    ),
    victim=st.integers(0, 10),
)
def test_chain_state_matches_reference_model(
    tmp_path_factory, n_dirs, n_epochs, corruption, victim
):
    dirs = _mk_group(tmp_path_factory.mktemp("grp"), n_dirs)
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
        # still valid: compacted epochs skip the file check

    ok, got_preds = epochs.chain_state(dirs)
    assert ok == expect_valid, (corruption, n_dirs, n_epochs)
    assert got_preds == expect_preds


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
