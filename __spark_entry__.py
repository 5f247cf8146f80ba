"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``strategy_analyzer_exporter_spark``; this
module only wires them to the driver contract.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from strategy_analyzer_exporter_spark.registry import ORACLES, QUERIES


def _recorded_names() -> tuple[dict[str, int], int, set[str]]:
    """({query name: latest round with a driver CORRECTNESS row},
    number of recorded rounds, {names whose LATEST row is a FAIL}).
    CORRECTNESS_r*.json live next to this file; membership tests on
    the dict behave like the old set. Files whose names don't match
    the r(\\d+) pattern are SKIPPED entirely (ADVICE r05): assigning
    them round 0 would exclude their queries from the fresh band while
    also making them ineligible for the changed band."""
    import re

    seen: dict[str, int] = {}
    latest_row: dict[str, tuple[int, bool]] = {}  # name → (round, green)
    rounds = 0
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
            for name, row in data.items():
                seen[name] = max(seen.get(name, 0), rnd)
                # require each match key to be EXPLICITLY True: a
                # truncated/partial row (e.g. {'err': null} with no
                # match keys) must count as failing, not green
                # (ADVICE r06)
                green = isinstance(row, dict) and not row.get("err") and all(
                    row.get(k) is True
                    for k in ("rows_match", "schema_match", "hash_match")
                )
                if rnd >= latest_row.get(name, (0, True))[0]:
                    latest_row[name] = (rnd, green)
            rounds += 1
        except (OSError, ValueError, AttributeError):
            continue
    failing = {n for n, (_, green) in latest_row.items() if not green}
    return seen, rounds, failing


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's full feature pipeline (bars →
    session filter → EMA(9)/EMA(21) → distance/slope/autocorrelation/
    OLV/CLV → warm-up gate → alphabetical float32 export projection)."""
    from strategy_analyzer_exporter_spark.operators.features import features_df

    return features_df(spark, "/root/testdata/sf0.001")


#: Queries whose IMPLEMENTATION changed in round CHANGED_AS_OF_ROUND:
#: their latest driver row predates the change, so they jump the
#: rotation queue (right after never-recorded names) to get a fresh
#: verified row immediately. The band AUTO-EXPIRES PER QUERY: a name
#: leaves the band as soon as it has a recorded row from round
#: CHANGED_AS_OF_ROUND or later (so a query that missed one round's
#: 50-slot sample keeps its priority until actually re-verified, and
#: no hand-maintained cleanup is needed).
#: r13 (VERDICT r12 #1): dedup_semdedup's assignment is re-shaped from
#: the flat corpus-derived-k Lloyd assign (n·k distances — the one
#: remaining scale-killer) to the TWO-LEVEL coarse-then-fine
#: hierarchical assign (kc = ⌈√k⌉ cells × kf = ⌈k/kc⌉ fine centroids
#: per cell, ~2n·√k total assignment work), so its r12 flat-k row is
#: stale by construction. Net-new registrations (kmeans_two_level,
#: the hierarchical assignment exposed as its own operator;
#: text_bpe_encode, the tokenizer-APPLY half of the r12 BPE trainer;
#: wave 2: text_bpe_tokenize_docs, the per-document encode, and
#: text_lm_likelihood_buckets, CCNet-style LM quality bucketing;
#: wave 3: text_gopher_rules, the canonical Gopher §A1.1 per-document
#: heuristic gate, and sample_temperature_mixture, α=0.5
#: temperature-scaled source sampling with the enacted hash-bucket
#: selection; wave 4: text_paragraph_dedup, C4/RefinedWeb-style
#: corpus-wide first-occurrence paragraph dedup with document
#: reconstruction). Net-new registrations: 7, so 7 fresh +
#: 2 changed-band slots leave 41 tail slots — the two r08-stale
#: records (streaming_dedup_watermarked, source_schema_evolution) are
#: the stalest-first HEAD of the tail and drain first, followed by the
#: 19-query r09 cohort (VERDICT r12 #4: 2 + 19 ≤ 41, so the drain
#: still completes with all four waves registered).
#: r14 (optimization round, VERDICT r13 #1): text_paragraph_dedup's
#: registered default moved from the window shape to the hash-keyed
#: metadata decision (xxhash64(para) shuffle + exact collision
#: resolution + map-side doc rebuild) — output-identical by
#: construction and twin-tested, but the implementation its r13 row
#: verified is no longer the one registered.
#: Also r14: similarity_pq_adc's registered default moved from the
#: all-pairs scored window to the cell-decision shape (candidates
#: sharing a code word collapse onto distinct cells; per-query work
#: bounded by PQ_K^PQ_M), and similarity_ivfpq_topk now restricts
#: candidates BEFORE the ADC chain instead of joining the restriction
#: into an all-pairs intermediate. Both output-identical (twin tests +
#: oracle) but the implementations their r09/r13 rows verified are no
#: longer the ones registered.
#: And dedup_simhash: the band self-join now carries 4 small-int band
#: keys derived straight from the vote columns instead of the 64-char
#: fingerprint string (narrower shuffle, int XOR/popcount verify) —
#: same pairs, same hamming, twin-tested against the string shape.
#: And text_repetition_signals / quality_gate_rollup (shared _signals
#: core): bigrams built array-side instead of lead()-over-window, and
#: the two top-gram row_number windows became min(struct(-cnt, gram))
#: aggregations — same rows, twin-tested.
#: r15 (optimization round 2): similarity_pq_adc's registered mode
#: became the metadata-driven pairs-vs-cells auto decision;
#: text_repetition_signals / quality_gate_rollup moved to the one-pass
#: Arrow map shape (quality._signals mode="map"). All three are
#: output-identical (twin tests + oracle) but their r14 rows verified
#: different implementations. (dedup_semdedup / kmeans_two_level are
#: NOT in the band: the depth-3 hierarchy was measured and REJECTED —
#: their registered implementations remain the r13-verified two-level
#: shape; see OPTIMIZATION_r15.md.)
#: Also r15: the windowed-feature stats stage moved from bounded
#: rowsBetween frames (O(window) decimal re-aggregation per row) to
#: running-sum + lag differences (O(1)/row) — exact-integer decimal
#: arithmetic, bit-identical output (twin-pinned), but the
#: implementation the features_* rows verified is no longer the one
#: registered.
CHANGED_THIS_ROUND: tuple[str, ...] = (
    "similarity_pq_adc",
    "text_repetition_signals",
    "quality_gate_rollup",
    "features_flagship",
    "features_flagship_full_ema",
    "features_strict_reference_quirk",
)
CHANGED_AS_OF_ROUND = 15  # a row from round ≥ 15 post-dates the change


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so queries with no driver CORRECTNESS row in any prior
    round come first: the driver samples a bounded number per round
    (50 as of r02), so front-loading never-recorded names guarantees
    every registered query accumulates a driver-verified row across
    rounds instead of resampling the same prefix. Queries re-implemented
    this round (CHANGED_THIS_ROUND) come next — their recorded rows are
    stale by construction.

    The already-recorded tail is ordered STALEST-RECORD-FIRST (latest
    recorded round ascending, name tiebreak): each round the driver's
    50 slots re-verify the queries whose records are oldest, which
    both drains any stale backlog in one pass (VERDICT r06 #1 — the
    alphabetical rotation this replaces in r07 needed two rounds) and
    self-balances: sampled queries get fresh rows and sink to the back,
    so with 178 registered every query is re-verified at least every
    ⌈178/50⌉ ≈ 4 rounds — the property the rotation was for (ADVICE
    r03), achieved with a tighter worst case.

    A query whose LATEST recorded row is a FAIL also joins the priority
    band (VERDICT r05 #5): its fix may predate the rotation reaching it
    by several rounds (agg_approx_distinct carried a pre-rewrite r01
    FAIL as its only row for four rounds), and a standing red row is
    worse for the record than re-verifying one query early."""
    seen, rounds, failing = _recorded_names()
    fresh = sorted(n for n in QUERIES if n not in seen)
    changed = [
        n
        for n in CHANGED_THIS_ROUND
        if n in QUERIES and 0 < seen.get(n, 0) < CHANGED_AS_OF_ROUND
    ]
    # failing ⊆ seen by construction (both are filled from the same
    # parsed rows), so only registry membership needs checking
    changed += sorted(
        n for n in failing if n in QUERIES and n not in changed
    )
    tail = sorted(
        (n for n in QUERIES if n in seen and n not in changed),
        key=lambda n: (seen[n], n),
    )
    return {n: QUERIES[n] for n in fresh + changed + tail}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted only
    for genuinely non-SQL-expressible ops → rows-only check)."""
    return dict(ORACLES)
