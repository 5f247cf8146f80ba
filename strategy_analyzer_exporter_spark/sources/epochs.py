"""Append-log / epoch manifest for at-rest index layouts (VERDICT r09 #2).

The r9 at-rest indexes (the bucketed dedup tables, the cell-partitioned
IVF-PQ code table) validated staging with a single ``_STAGED_OK``
fingerprint describing the INITIAL build, so any append had to
invalidate the flag and a fresh session re-BUILT the whole index from
the corpus. Production ingest is append → append → append across many
sessions; this module gives every at-rest layout the missing piece: a
per-directory epoch chain whose markers let a fresh session VALIDATE an
appended layout from the filesystem alone and re-attach instead of
rebuilding.

Protocol (two-phase, crash-safe — the _STAGED_OK lesson applied to
appends):

1. ``begin_epoch`` writes ``_EPOCH_<n>_PENDING`` into every directory
   of the group BEFORE any data file is touched. A PENDING marker
   without its matching OK means a torn append: validation fails and
   the next ensure pass rebuilds from scratch — exactly the safety the
   old flag-removal bought, but scoped to crashed appends instead of
   every append.
2. The caller appends its data files (bucketed saveAsTable append /
   partitioned parquet append), snapshotting each directory's data-file
   listing before and after.
3. ``commit_epoch`` writes ``_EPOCH_<n>_OK`` — a JSON record carrying
   the append's PREDICATE (a SQL string, the cross-session identity of
   the batch), the added files with their sizes, and the appended row
   counts (read from the new parquet footers driver-side — no Spark
   job) — then removes the PENDING markers. The OK file is the commit
   point.

Validation (``chain_state``) is filesystem-only, like the fingerprint
checks — staging validity must be checkable before a session has read
anything: no PENDING without OK, OK chain contiguous from 1, every
non-compacted epoch's recorded files still present with their recorded
sizes. Marker names start with ``_`` so Spark's file index treats them
as hidden — they are invisible to table/parquet scans sharing the
directory.

Compaction (VERDICT r09 #3) rewrites a layout back to one file per
bucket/cell; the epoch HISTORY must survive (it is what expected-state
matching validates against) while the per-epoch file lists become
meaningless. ``rewrite_compacted`` re-emits each OK marker with
``compacted: true`` and an empty file list — validation keeps checking
the chain and predicates but skips the file-existence check for
compacted epochs (the compacted data files are the base layout's now).

Base record + orphan detection (VERDICT r10 #3): epoch 0 is the BASE
build's record — ``record_base`` snapshots the data-file listing the
initial build produced (and ``rewrite_compacted`` re-snapshots it,
since compaction's output IS the new base). With a base record
present, ``chain_state`` additionally rejects any data file accounted
for by NEITHER the base NOR any epoch — an out-of-band or racing
writer's files previously rode along silently inside whatever scan
read the directory. Layouts staged before this protocol lack epoch 0;
``ensure_base`` adopts one on the first successful attach (current
files minus epoch-recorded files = base — exactly as trustworthy as
the attach itself), so protection activates without forcing rebuilds.

Concurrent appenders (VERDICT r10 #3): ``begin_epoch`` creates its
PENDING markers with O_EXCL, so two appenders that both computed the
same next epoch number collide on the marker name and the loser fails
LOUDLY before writing any data — the single-writer contract is
enforced by the filesystem, not by convention. (A loser that raced a
*completed* append instead sees the chain advance and its number taken
by an OK record: chain_state then reports the pre-claimed slot.)

Vacuum manifest (ADVICE r10): a vacuumed layout (rows physically
purged during compaction) no longer satisfies its derivation
fingerprint even though flag + chain still validate. ``record_vacuum``
appends the vacuum's predicate to a ``_VACUUMED`` JSON list and
``vacuum_state`` reads it back; attach paths compare it against their
DECLARED vacuums (default: none), so a mistakenly-vacuumed index is
detected instead of silently re-attaching as pristine.

All markers are tiny JSON files; nothing here runs a Spark job.
"""

from __future__ import annotations

import json
import os
import re

_PENDING_RE = re.compile(r"^_EPOCH_(\d{4})_PENDING$")
_OK_RE = re.compile(r"^_EPOCH_(\d{4})_OK$")


def data_files(root: str) -> dict[str, int]:
    """{relative path: size} for every DATA file under ``root`` —
    hidden files/dirs (leading ``_`` or ``.``), i.e. markers, flags and
    in-flight ``_temporary`` output, are excluded, matching Spark's own
    hidden-file convention."""
    out: dict[str, int] = {}
    for r, dirs, files in os.walk(root):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(r, f)
            out[os.path.relpath(p, root)] = os.stat(p).st_size
    return out


def parquet_rows(root: str, rel_files: list[str]) -> int:
    """Sum of row counts from the listed parquet files' FOOTERS —
    driver-side metadata reads, no Spark job (the epoch record's row
    count, VERDICT r09 #2)."""
    import pyarrow.parquet as papq

    n = 0
    for rel in rel_files:
        try:
            n += papq.ParquetFile(os.path.join(root, rel)).metadata.num_rows
        except Exception:
            return -1  # unreadable footer — recorded, never validated
    return n


def begin_epoch(dirs: list[str], n: int, pred: str) -> None:
    """Phase 1: declare the in-flight append in every group directory
    BEFORE touching data. A crash from here until ``commit_epoch``
    leaves PENDING markers that fail validation → rebuild.

    Markers are created with O_EXCL (mode ``x``): a second appender
    that raced this one to the same epoch number fails here, before
    touching any data file — the filesystem enforces the single-writer
    contract (VERDICT r10 #3). Markers already created by THIS call
    are left in place on collision: the chain is now genuinely torn
    (two writers raced) and must fail validation."""
    for d in dirs:
        p = os.path.join(d, f"_EPOCH_{n:04d}_PENDING")
        try:
            with open(p, "x") as f:
                json.dump({"pred": pred}, f)
        except FileExistsError:
            raise RuntimeError(
                f"epoch {n} already claimed in {d} (concurrent appender "
                f"or stale PENDING marker) — refusing to double-write"
            ) from None


def commit_epoch(
    dirs: list[str],
    n: int,
    pred: str,
    added: dict[str, dict[str, int]],
    base_fp: str,
) -> None:
    """Phase 2: write the OK record (the commit point), then clear the
    PENDING markers. ``added`` maps each directory to its {relfile:
    size} diff from the append."""
    for d in dirs:
        files = added.get(d, {})
        rec = {
            "pred": pred,
            "base_fp": base_fp,
            "compacted": False,
            "files": files,
            "rows": parquet_rows(d, list(files)),
        }
        with open(os.path.join(d, f"_EPOCH_{n:04d}_OK"), "w") as f:
            json.dump(rec, f)
    for d in dirs:
        p = os.path.join(d, f"_EPOCH_{n:04d}_PENDING")
        if os.path.exists(p):
            os.remove(p)


def record_base(dirs: list[str]) -> None:
    """Snapshot each directory's current data-file listing as the BASE
    record (epoch 0) — called right after an initial build. With it in
    place, ``chain_state`` rejects data files accounted for by neither
    the base nor any committed epoch (orphan detection, VERDICT r10
    #3)."""
    for d in dirs:
        files = data_files(d)
        rec = {
            "pred": "",
            "base": True,
            "compacted": False,
            "files": files,
            "rows": parquet_rows(d, list(files)),
        }
        with open(os.path.join(d, "_EPOCH_0000_OK"), "w") as f:
            json.dump(rec, f)


def ensure_base(dirs: list[str]) -> None:
    """Adopt-on-attach upgrade for layouts staged before the base
    record existed: if a directory's chain validates but has no epoch
    0, record one as (current data files − files recorded by committed
    epochs). Exactly as trustworthy as the attach that just validated
    the layout; from here on, orphan detection is active. No-op when
    the record exists. Call ONLY after ``chain_state`` passed."""
    for d in dirs:
        if os.path.exists(os.path.join(d, "_EPOCH_0000_OK")):
            continue
        claimed: set[str] = set()
        for f in os.listdir(d):
            m = _OK_RE.match(f)
            if m and int(m.group(1)) >= 1:
                try:
                    with open(os.path.join(d, f)) as fh:
                        claimed |= set(json.load(fh).get("files", {}))
                except (OSError, ValueError):
                    claimed = None  # invalid chain — not ours to repair
                    break
        if claimed is None:
            continue
        files = {
            rel: sz for rel, sz in data_files(d).items() if rel not in claimed
        }
        rec = {
            "pred": "",
            "base": True,
            "compacted": False,
            "files": files,
            "rows": parquet_rows(d, list(files)),
        }
        with open(os.path.join(d, "_EPOCH_0000_OK"), "w") as f:
            json.dump(rec, f)


def record_vacuum(d: str, pred: str) -> None:
    """Append ``pred`` to the directory's ``_VACUUMED`` manifest — the
    declared-state record that lets attach paths distinguish a
    vacuumed fork from the pristine layout (ADVICE r10)."""
    p = os.path.join(d, "_VACUUMED")
    vacs = vacuum_state(d)
    vacs.append(pred)
    with open(p, "w") as f:
        json.dump(vacs, f)


def vacuum_state(d: str) -> list[str]:
    """The directory's applied-vacuum predicate list, [] if never
    vacuumed. An unreadable manifest returns a sentinel that matches no
    expectation — poisoned state must force rebuild, never attach."""
    try:
        with open(os.path.join(d, "_VACUUMED")) as f:
            vacs = json.load(f)
        if not isinstance(vacs, list):
            return ["<unreadable _VACUUMED>"]
        return [str(v) for v in vacs]
    except FileNotFoundError:
        return []
    except (OSError, ValueError):
        return ["<unreadable _VACUUMED>"]


def chain_state(dirs: list[str]) -> tuple[bool, list[str]]:
    """(valid, committed predicate chain) for a group of directories
    that are appended together. Valid iff, in EVERY directory: no
    PENDING marker survives (torn append), the OK chain is contiguous
    (an optional base record 0, then 1..K) with the same K and the
    same predicates group-wide, each non-compacted epoch's recorded
    files still exist with their recorded sizes, and — when a base
    record is present — every data file on disk is accounted for by
    the base or some epoch (orphan rejection, VERDICT r10 #3). The
    returned predicate chain covers epochs ≥ 1 only; the base record
    has no predicate. Filesystem-only — zero Spark jobs."""
    group_preds: list[str] | None = None
    for d in dirs:
        if not os.path.isdir(d):
            return False, []
        oks: dict[int, dict] = {}
        for f in os.listdir(d):
            if _PENDING_RE.match(f):
                return False, []  # torn append
            m = _OK_RE.match(f)
            if m:
                try:
                    with open(os.path.join(d, f)) as fh:
                        oks[int(m.group(1))] = json.load(fh)
                except (OSError, ValueError):
                    return False, []
        epoch_ids = sorted(i for i in oks if i >= 1)
        if epoch_ids != list(range(1, len(epoch_ids) + 1)):
            return False, []  # gap in the chain
        preds = [oks[i]["pred"] for i in epoch_ids]
        if group_preds is None:
            group_preds = preds
        elif preds != group_preds:
            return False, []  # directories disagree — partial append
        for rec in oks.values():
            if rec.get("compacted"):
                continue
            for rel, size in rec.get("files", {}).items():
                p = os.path.join(d, rel)
                try:
                    if os.stat(p).st_size != size:
                        return False, []
                except OSError:
                    return False, []
        if 0 in oks:
            accounted: set[str] = set()
            for rec in oks.values():
                accounted |= set(rec.get("files", {}))
            if set(data_files(d)) - accounted:
                return False, []  # orphan data file — out-of-band writer
    return True, group_preds or []


def rewrite_compacted(d: str) -> None:
    """After compaction rewrote ``d``'s data files, re-emit each OK
    marker with ``compacted: true`` and no file list — the chain and
    its predicates survive (expected-state matching still works), the
    stale per-epoch file references do not — and re-snapshot the base
    record over the NEW listing: compaction's output is the new base,
    so orphan detection keeps working on the compacted layout."""
    for f in sorted(os.listdir(d)):
        m = _OK_RE.match(f)
        if not m or int(m.group(1)) == 0:
            continue
        p = os.path.join(d, f)
        with open(p) as fh:
            rec = json.load(fh)
        rec["compacted"] = True
        rec["files"] = {}
        with open(p, "w") as fh:
            json.dump(rec, fh)
    record_base([d])


def recover_torn_epoch(dirs: list[str], pred: str) -> bool:
    """Clean up THIS WRITER's own torn append attempt for ``pred`` —
    the retry primitive a streaming ingest needs (a micro-batch that
    crashed mid-append is re-delivered by the engine; the retry must
    be able to clear its own wreckage and append cleanly instead of
    poisoning the layout into a full rebuild).

    Every surviving PENDING marker must record ``pred`` — a PENDING
    carrying a DIFFERENT predicate is someone else's tear and raises
    (that caller gets the rebuild treatment, exactly as before this
    primitive existed).

    A crash can also land MID-``commit_epoch`` (ADVICE r11): the OK
    record written in some group directories but not others, or all
    OKs written with leftover PENDINGs. The recovery decision is
    GROUP-WIDE per torn epoch, so the chain never ends up disagreeing
    across directories:

    * OK present in EVERY directory → the commit's decision point
      passed; roll FORWARD by finishing ``commit_epoch``'s last loop
      (remove the leftover PENDINGs, keep the data).
    * OK missing somewhere → roll BACKWARD everywhere: delete this
      writer's half-committed OK records (necessarily the chain head)
      with their recorded files, then delete every data file accounted
      for by neither the base record nor any committed epoch — which
      is precisely the torn attempt's partial output, BY CONSTRUCTION
      of the base-record orphan contract (VERDICT r10 #3): committed
      state is always fully recorded, so unrecorded files can only
      belong to the tear. (Roll-backward is always reachable here:
      ``commit_epoch`` removes no PENDING until every OK is written,
      so an OK missing anywhere implies every directory still holds
      its PENDING claim.)

    An OK for a torn epoch number whose predicate is NOT ``pred``
    means a racer committed that slot after this writer's claim went
    stale — not ours to roll back; raises.

    Safe ONLY under the protocol's single-writer contract (begin_epoch
    claims markers with O_EXCL): the caller owns any tear that matches
    its predicate. Returns True if anything was cleaned."""
    # pass 1: scan + validate; collect each dir's matching PENDINGs
    # and the group-wide set of torn epoch numbers
    pend: dict[str, list[str]] = {}
    oks: dict[str, dict[int, dict]] = {}
    torn_ids: set[int] = set()
    for d in dirs:
        pend[d] = []
        oks[d] = {}
        for f in os.listdir(d):
            pm = _PENDING_RE.match(f)
            if pm:
                pend[d].append(f)
                torn_ids.add(int(pm.group(1)))
                continue
            m = _OK_RE.match(f)
            if m:
                try:
                    with open(os.path.join(d, f)) as fh:
                        oks[d][int(m.group(1))] = json.load(fh)
                except (OSError, ValueError):
                    # unreadable OK record: treat its files as unknown —
                    # refuse to guess what the tear owns
                    raise RuntimeError(
                        f"unreadable epoch record {f} in {d}; cannot "
                        f"recover a tear over a poisoned chain"
                    ) from None
        for f in pend[d]:
            try:
                with open(os.path.join(d, f)) as fh:
                    rec_pred = json.load(fh).get("pred")
            except (OSError, ValueError):
                rec_pred = "<unreadable>"
            if rec_pred != pred:
                raise RuntimeError(
                    f"torn epoch {f} in {d} records predicate "
                    f"{rec_pred!r}, not this writer's {pred!r} — "
                    f"refusing to clean someone else's tear"
                )
    if not any(pend.values()):
        return False
    # pass 2a: VALIDATE the whole group-wide forward/backward plan
    # before touching anything (ADVICE r12: the old in-place loop
    # deleted a half-committed OK record and its data files before a
    # later dir's chain-head check or pass 3's base-record check could
    # raise — a "rebuild instead" group was partially mutated first).
    # Rollbacks change later head computations, so the validation
    # SIMULATES them on a copy of the committed-epoch key sets; every
    # raise below therefore fires with the on-disk state untouched.
    sim = {d: set(oks[d]) for d in dirs}
    plan: list[tuple[int, str, list[str]]] = []
    forward_rolled: set[int] = set()
    for n in sorted(torn_ids):
        committed = [d for d in dirs if n in sim[d]]
        for d in committed:
            if oks[d][n].get("pred") != pred:
                raise RuntimeError(
                    f"epoch {n} in {d} is committed with predicate "
                    f"{oks[d][n].get('pred')!r}, not this writer's "
                    f"{pred!r} — a racer took the slot; rebuild instead"
                )
        if len(committed) == len(dirs):
            plan.append((n, "forward", list(dirs)))
            forward_rolled.add(n)
            continue
        for d in committed:
            head = max(i for i in sim[d] if i >= 1)
            if n != head:
                raise RuntimeError(
                    f"half-committed epoch {n} in {d} is not the chain "
                    f"head ({head}) — cannot roll back; rebuild instead"
                )
            sim[d].discard(n)
        plan.append((n, "backward", committed))
    # pass 3's base-record precondition, hoisted: any dir that will
    # still hold a matching PENDING after the forward rolls needs the
    # base record for the unaccounted-file sweep — raise NOW, before
    # any mutation, not after pass 2 has executed
    for d in dirs:
        will_sweep = any(
            int(_PENDING_RE.match(f).group(1)) not in forward_rolled
            for f in pend[d]
        )
        if will_sweep and 0 not in oks[d]:
            raise RuntimeError(
                f"{d} has no base record (_EPOCH_0000_OK); tear "
                f"recovery needs the orphan contract — rebuild instead"
            )
    # pass 2b: execute the validated plan (mutations only from here on)
    for n, action, touched in plan:
        if action == "forward":
            # roll forward: the OK phase completed group-wide — only
            # the PENDING-removal loop was cut short
            for d in touched:
                p = os.path.join(d, f"_EPOCH_{n:04d}_PENDING")
                if os.path.exists(p):
                    os.remove(p)
                pend[d] = [
                    f for f in pend[d] if f != f"_EPOCH_{n:04d}_PENDING"
                ]
            continue
        # roll backward: undo the half-written commit in the dirs it
        # reached, so the unaccounted-file sweep below owns its data
        for d in touched:
            for rel in oks[d][n].get("files", {}):
                p = os.path.join(d, rel)
                if os.path.exists(p):
                    os.remove(p)
            os.remove(os.path.join(d, f"_EPOCH_{n:04d}_OK"))
            del oks[d][n]
    # pass 3: per-dir sweep of the torn attempt's partial data
    cleaned = True
    for d in dirs:
        if not pend[d]:
            continue
        if not os.path.exists(os.path.join(d, "_EPOCH_0000_OK")):
            # without the base record, base data files are in no OK
            # record and would be indistinguishable from the tear —
            # deleting "unaccounted" files here would destroy the base
            raise RuntimeError(
                f"{d} has no base record (_EPOCH_0000_OK); tear "
                f"recovery needs the orphan contract — rebuild instead"
            )
        accounted: set[str] = set()
        for rec in oks[d].values():
            accounted.update(rec.get("files", {}))
        for rel in data_files(d):
            if rel not in accounted:
                os.remove(os.path.join(d, rel))
        for f in pend[d]:
            os.remove(os.path.join(d, f))
    return cleaned
