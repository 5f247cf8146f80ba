"""Large-star/small-star connected components: long-chain convergence.

A 500-node path graph is the adversarial case for min-label
propagation (needs ~499 diameter rounds); the star backend must label
it in O(log² n) rounds. Also cross-checks both backends agree on a
multi-component graph.
"""

from __future__ import annotations

import math

from strategy_analyzer_exporter_spark.operators import dedup


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def test_path_graph_converges_fast(spark):
    n = 500
    chain = [(i, i + 1) for i in range(n - 1)]
    labels = dedup.connected_components_star(_edges_df(spark, chain))
    got = {r.doc_id: r.cluster_id for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    # O(log² n) bound with slack; propagation would need n-1 rounds
    bound = int(math.log2(n) ** 2)
    assert 0 < dedup._LAST_STAR_ROUNDS <= bound, dedup._LAST_STAR_ROUNDS


def test_backends_agree_multi_component(spark):
    # two chains, one triangle, self-dup noise, reversed edge order
    pairs = (
        [(i, i + 1) for i in range(10, 15)]
        + [(100, 101), (102, 101)]
        + [(7, 8), (8, 9), (9, 7)]
        + [(3, 2)]
    )
    star = {
        (r.doc_id, r.cluster_id)
        for r in dedup.connected_components_star(_edges_df(spark, pairs)).collect()
    }
    prop = {
        (r.doc_id, r.cluster_id)
        for r in dedup.connected_components(_edges_df(spark, pairs)).collect()
    }
    assert star == prop
    assert (102, 100) in star and (9, 7) in star and (3, 2) in star


def test_empty_edges(spark):
    empty = _edges_df(spark, [])
    assert dedup.connected_components_star(empty).count() == 0
