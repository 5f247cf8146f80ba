"""Overlapping-band recall for fuzzy Levenshtein dedup.

A near-identical pair straddling a length-band boundary (99 vs 101
chars around the 100-char edge) is invisible to single-band blocking
(floor(99/100)=0 vs floor(101/100)=1) but MUST be found by the
two-grid overlapping scheme: both docs land in grid-1 band 1
(floor((len+50)/100)). Also asserts the pair-dedupe: docs colliding on
both grids yield exactly one candidate row.
"""

from __future__ import annotations

import pandas as pd
import pytest

from strategy_analyzer_exporter_spark.operators.dedup import (
    LEV_BAND,
    _q_dedup_fuzzy,
)


@pytest.fixture(scope="module")
def fuzzy_dir(tmp_path_factory):
    base = "x" * 95  # shared prefix, identical within LEV_PREFIX
    rows = [
        # straddling pair: 99 vs 101 chars — different primary bands
        {"doc_id": 1, "lang": "en", "text": base + "abcd"},  # 99
        {"doc_id": 2, "lang": "en", "text": base + "abcdef"},  # 101
        # same-band pair (both 120 chars): collides on BOTH grids
        {"doc_id": 3, "lang": "en", "text": base + "y" * 25},  # 120
        {"doc_id": 4, "lang": "en", "text": base + "z" * 25},  # 120
        # far-away doc: no candidate with anyone
        {"doc_id": 5, "lang": "en", "text": "q" * 400},
    ]
    for r in rows:
        r["source"] = "t"
        r["n_chars"] = len(r["text"])
    d = tmp_path_factory.mktemp("fuzzy")
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    return str(d)


def test_straddling_pair_found(spark, fuzzy_dir):
    assert len("x" * 95 + "abcd") == LEV_BAND - 1  # sanity: 99 vs 101
    got = {
        (r.doc_a, r.doc_b): r.edit_dist
        for r in _q_dedup_fuzzy(spark, fuzzy_dir).collect()
    }
    # the boundary pair the single-band scheme misses
    assert (1, 2) in got and got[(1, 2)] <= 5
    # ordinary same-band pair still found, exactly once despite
    # colliding on both grids
    assert (3, 4) in got
    rows = _q_dedup_fuzzy(spark, fuzzy_dir).collect()
    keys = [(r.doc_a, r.doc_b) for r in rows]
    assert len(keys) == len(set(keys)), "pair dedupe failed"
    # the outlier matches nothing
    assert not any(5 in k for k in keys)


# ---------------------------------------------------------------------------
# MinHash signature-agreement prefilter hook (r07, measured-and-rejected
# — dedup.py MINHASH_AGREE_MIN). The registered query runs unfiltered;
# this test pins the property the rejection analysis relied on: on a
# corpus of planted near-dups, enabling the prefilter at m = 4 or 5
# loses NO pair the exact-Jaccard verify accepts.


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(400)]
    rows = []
    did = 0
    for base in range(30):
        words = [rng.choice(vocab) for _ in range(40)]
        rows.append({"doc_id": did, "text": " ".join(words)})
        did += 1
        if base % 3 == 0:  # plant a near-dup: ~12% of words replaced
            mut = list(words)
            for _ in range(5):
                mut[rng.randrange(len(mut))] = rng.choice(vocab)
            rows.append({"doc_id": did, "text": " ".join(mut)})
            did += 1
    for r in rows:
        r["lang"] = "en"
        r["source"] = "t"
        r["n_chars"] = len(r["text"])
    d = tmp_path_factory.mktemp("planted")
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    return str(d)


def test_agreement_prefilter_loses_no_verified_pair(spark, planted_dir):
    from strategy_analyzer_exporter_spark.operators.dedup import (
        _q_dedup_minhash,
        clear_gram_cache,
    )

    try:
        unfiltered = {
            (r.doc_a, r.doc_b)
            for r in _q_dedup_minhash(spark, planted_dir, agree_min=0).collect()
        }
        assert unfiltered, "corpus must yield planted near-dup pairs"
        for m in (4, 5):
            got = {
                (r.doc_a, r.doc_b)
                for r in _q_dedup_minhash(
                    spark, planted_dir, agree_min=m
                ).collect()
            }
            assert got == unfiltered, (
                f"agree_min={m} changed the verified pair set: "
                f"lost={unfiltered - got} gained={got - unfiltered}"
            )
    finally:
        # drop ONLY the tmp corpus's cache entries; the shared
        # sf-fixture caches other dedup tests rely on stay resident
        clear_gram_cache(planted_dir)


def test_incremental_dedup_equals_full_pairs_cross_side(spark):
    """dedup_incremental_minhash (batch-vs-corpus band join) must find
    EXACTLY the full self-join query's verified pairs that straddle the
    corpus/batch split — same signatures, same bands, same verify, so
    the only difference is which pairs are candidates at all."""
    from strategy_analyzer_exporter_spark.operators.dedup import (
        BATCH_MOD,
        _q_dedup_incremental,
        _q_dedup_minhash,
    )

    sf = "/root/testdata/sf0.01"
    full = {
        (a, b) if a % BATCH_MOD != 0 else (b, a)
        for a, b, _ in _q_dedup_minhash(spark, sf).collect()
        if (a % BATCH_MOD == 0) != (b % BATCH_MOD == 0)
    }
    incr = {
        (c, bt) for c, bt, _ in _q_dedup_incremental(spark, sf).collect()
    }
    assert incr == full and len(incr) > 0


def test_simhash_int_keys_equal_bits_twin(spark):
    """r14 optimization: the registered integer-band-key SimHash must
    produce EXACTLY the string-fingerprint twin's pairs+hamming on the
    real corpora — the int key k_b is the base-2 reading of the string
    band substring by construction, so any divergence is a bug in the
    bit packing."""
    from strategy_analyzer_exporter_spark.operators.dedup import (
        _q_dedup_simhash,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        keys = sorted(tuple(r) for r in _q_dedup_simhash(spark, sf).collect())
        bits = sorted(
            tuple(r)
            for r in _q_dedup_simhash(spark, sf, mode="bits").collect()
        )
        assert keys == bits, (sf, len(keys), len(bits))
