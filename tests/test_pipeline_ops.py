"""Training-data pipeline ops (operators/pipeline.py): plan shape and
semantic invariants the oracle comparison can't see."""

import pyspark.sql.functions as F

from strategy_analyzer_exporter_spark import plans as P
from strategy_analyzer_exporter_spark.operators import pipeline as PL
from strategy_analyzer_exporter_spark.registry import QUERIES
from strategy_analyzer_exporter_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_sampling_is_map_only(spark):
    """Hash sampling must be a pure scan+filter — zero exchanges."""
    q = QUERIES["sample_hash_stratified"](spark, SF)
    assert P.count_exchanges(q) == 0, P.physical_plan(q)


def test_split_is_map_only_and_total(spark):
    q = QUERIES["split_train_val_test"](spark, SF)
    assert P.count_exchanges(q) == 0, P.physical_plan(q)
    total = load_table(spark, SF, "documents").count()
    assert q.count() == total  # every document gets exactly one split
    assert set(r["split"] for r in q.select("split").distinct().collect()) <= {
        "train",
        "val",
        "test",
    }


def test_split_is_idempotent_under_corpus_growth(spark):
    """A document's split must not depend on what else is in the corpus
    (hash membership, not position) — the property that makes the split
    stable when the crawl is extended."""
    d = load_table(spark, SF, "documents")
    full = {r["doc_id"]: r["split"] for r in QUERIES["split_train_val_test"](spark, SF).collect()}
    half_ids = {r["doc_id"] for r in d.filter(F.col("doc_id") % 2 == 0).select("doc_id").collect()}
    # recompute on the half corpus by filtering the same query's input
    sub = QUERIES["split_train_val_test"](spark, SF).filter(
        F.col("doc_id").isin(*half_ids)
    )
    for r in sub.collect():
        assert full[r["doc_id"]] == r["split"]


def test_pack_respects_budget_start_offsets(spark):
    """Every doc's bin = floor(start_offset / budget): bins are
    contiguous per source and total tokens are conserved."""
    q = QUERIES["pack_sequences"](spark, SF)
    rows = q.collect()
    d = load_table(spark, SF, "documents")
    from strategy_analyzer_exporter_spark.functions import tokens

    total = d.select(F.sum(F.size(tokens(F.col("text"))))).first()[0]
    assert sum(r["bin_tokens"] for r in rows) == total
    per_source: dict[str, list[int]] = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(r["bin_id"])
    for src, bins in per_source.items():
        bins.sort()
        assert bins[0] == 0 and bins == list(range(len(bins))), (src, bins)


def test_pack_exchange_budget(spark):
    # one shuffle for the per-source window; the (source, bin_id)
    # aggregation adds at most one more
    q = QUERIES["pack_sequences"](spark, SF)
    assert P.count_exchanges(q) <= 2, P.physical_plan(q)


def test_kmeans_assign_broadcasts_centroids(spark):
    """The centroid side must broadcast — assignment has to stay a
    map-only scan of the big relation (no shuffle of the vectors)."""
    e = load_table(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = e.limit(PL.KM_K).select(
        F.col("vec_id").cast("long").alias("cid"), F.col("v").alias("cv")
    )
    assigned = PL.kmeans_assign(e, cents)
    plan = P.physical_plan(assigned)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert P.count_sort_merge_joins(assigned) == 0, plan


def test_kmeans_partitions_all_vectors(spark):
    q = QUERIES["kmeans_embeddings"](spark, SF)
    rows = q.collect()
    n = load_table(spark, SF, "embeddings").count()
    assert len(rows) == n
    assert len({r["vec_id"] for r in rows}) == n
    assert {r["cid"] for r in rows} <= set(range(PL.KM_K))


def test_corpus_clean_counts_are_consistent(spark):
    q = QUERIES["corpus_clean_pipeline"](spark, SF)
    for r in q.collect():
        assert r["n_input"] == r["n_quality_fail"] + r["n_dup_dropped"] + r["n_kept"]


def test_q16_broadcasts_denylist(spark):
    q = QUERIES["q16_supplier_part_counts"](spark, SF)
    assert P.count_broadcast_joins(q) >= 1, P.physical_plan(q)


def test_q18_broadcasts_qualifying_orders(spark):
    q = QUERIES["q18_large_orders"](spark, SF)
    plan = P.physical_plan(q)
    assert "BroadcastHashJoin" in plan, plan


def test_q15_single_fact_shuffle(spark):
    """Revenue is aggregated once; the max-scalar and supplier joins
    must not re-shuffle lineitem."""
    q = QUERIES["q15_top_revenue_supplier"](spark, SF)
    plan = P.physical_plan(q)
    assert plan.count("Scan parquet") <= 3, plan  # lineitem + supplier (+reuse)


def test_pq_recall_floor(spark):
    """ANN quality is a measured, asserted number, not a vibe. Both
    metrics are emitted honestly named: hit_rate = hits over the
    candidates the index RETURNED (precision@3), recall = hits over the
    exact top-5 ground-truth set. Measured hit_rate mean: 0.30 at
    sf0.001, 0.37 at sf0.01 — floor 0.2 (recall floor = 3/5 of that).
    LSH rows are sanity-bounded only (an 8-bit bucket on this corpus
    finds near-orthogonal candidates; its quality is honestly ~0)."""
    rows = QUERIES["similarity_pq_recall"](spark, SF).collect()
    by = {m: [r for r in rows if r.method == m] for m in
          ("pq_adc", "lsh_ann", "lsh_multitable", "ivf_label")}
    pq = by["pq_adc"]
    assert len(pq) == 10 and all(r.n_approx == 3 and r.n_truth == 5 for r in pq)
    assert sum(r.hit_rate for r in pq) / len(pq) >= 0.2
    assert sum(r.recall for r in pq) / len(pq) >= 0.2 * 3 / 5
    # every registered ANN method has a measured, asserted floor
    # (r05: multitable + IVF added). Measured means at sf0.001:
    # multitable hit 0.12 (the multi-table OR of buckets beats the
    # single 8-bit bucket's honest ~0), ivf 0.067 — floors set at
    # roughly half the measured values.
    mt = by["lsh_multitable"]
    assert len(mt) == 10 and all(r.n_approx == 5 for r in mt)
    assert sum(r.hit_rate for r in mt) / len(mt) >= 0.05
    ivf = by["ivf_label"]
    assert len(ivf) == 10 and all(r.n_approx == 3 for r in ivf)
    assert sum(r.hit_rate for r in ivf) / len(ivf) >= 0.03
    assert len(by["lsh_ann"]) >= 5  # sanity-bounded only (quality ~0)
    for r in rows:
        assert 0.0 <= r.recall <= r.hit_rate <= 1.0
        assert abs(r.recall - r.n_hits / r.n_truth) < 1e-12


def test_media_decode_stub_plumbing(spark):
    """The generic decode stub is library-only (not registered — it can
    never be value-checked; multimodal_decode_ppm is the oracle-backed
    decode), but its Spark plumbing — schema, mapInPandas batch shape,
    deterministic fake decoder — must stay real and tested."""
    from strategy_analyzer_exporter_spark.operators.multimodal import (
        _q_media_decode,
        media_table,
    )

    out = _q_media_decode(spark, SF)
    assert [f.name for f in out.schema.fields] == [
        "media_id",
        "media_type",
        "decoded_ok",
        "decoder",
        "mean_byte",
        "resized_width",
        "resized_height",
    ]
    rows = out.collect()
    assert len(rows) == media_table(spark, SF).count()
    assert all(r.decoded_ok and r.decoder == "fake-deterministic" for r in rows)
    assert all(0.0 <= r.mean_byte <= 255.0 for r in rows)
    assert all(
        1 <= r.resized_width <= 64 and 1 <= r.resized_height <= 64 for r in rows
    )


def test_multimodal_feature_hash_map_only(spark):
    q = QUERIES["multimodal_feature_hash"](spark, SF)
    assert P.count_exchanges(q) == 0, P.physical_plan(q)


def test_operator_modules_import_standalone():
    """Python workers import the module of any module-level UDF callable
    FIRST (cloudpickle by-reference), which re-enters registry._load_all
    while that module is partially initialized. Every operator module
    must therefore survive being the entry import — no register-time
    imports from sibling operator modules (a real worker crash: the
    decode stub died when relational5's checksum oracle imported a
    multimodal helper)."""
    import subprocess
    import sys

    mods = [
        "multimodal", "dedup", "pipeline", "graph", "relational5",
        "sources_formats", "text", "similarity", "pipeline3",
        "pq", "quality", "pii", "mixture", "tpch2", "ann_recall", "etl",
        "finance",
    ]
    for m in mods:
        r = subprocess.run(
            [sys.executable, "-c",
             f"import strategy_analyzer_exporter_spark.operators.{m}"],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 0, f"{m}: {r.stderr[-500:]}"


def test_partial_aggregates_merge_incrementally(spark):
    """Incremental ETL property: aggregating yesterday's partial result
    merged with today's delta must equal aggregating the full input —
    holds because count/dsum are mergeable (decimal sums re-aggregate
    exactly). This is what lets a 100 TB rollup update from deltas
    instead of rescanning history."""
    import pyspark.sql.functions as F

    from strategy_analyzer_exporter_spark.functions import dsum

    li = load_table(spark, SF, "lineitem")
    expr = lambda: dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    full = {
        r["l_returnflag"]: (r["n"], r["rev"])
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), expr().alias("rev"))
        .collect()
    }
    part1 = li.filter(F.col("l_orderkey") % 2 == 0)
    part2 = li.filter(F.col("l_orderkey") % 2 == 1)

    def partial(df):
        # partials carry the DECIMAL sum (not the double) — merging
        # doubles would re-introduce order dependence
        return df.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,10)"
                )
            ).alias("rev_dec"),
        )

    merged = {
        r["l_returnflag"]: (r["n"], r["rev"])
        for r in partial(part1)
        .unionByName(partial(part2))
        .groupBy("l_returnflag")
        .agg(
            F.sum("n").alias("n"),
            F.sum("rev_dec").cast("string").cast("double").alias("rev"),
        )
        .collect()
    }
    assert merged == full


def test_sql_text_api_over_registered_views(spark):
    """The SQL front-end: register_views + spark.sql must agree with the
    DataFrame API (same Catalyst plans underneath)."""
    import pyspark.sql.functions as F

    from strategy_analyzer_exporter_spark.sources.tables import register_views

    register_views(spark, SF)
    got = {
        (r["l_returnflag"], r["n"])
        for r in spark.sql(
            "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag"
        ).collect()
    }
    want = {
        (r["l_returnflag"], r["n"])
        for r in load_table(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_hex8_fold_matches_python(spark):
    """The portable hex8→BIGINT SQL fold must equal Python's int(h,16)
    for the md5 prefixes it's applied to (checksums, hash features)."""
    import hashlib

    from strategy_analyzer_exporter_spark.functions import hex8_to_long_sql

    vals = [f"probe-{i}" for i in range(50)]
    df = spark.createDataFrame([(v,) for v in vals], "s string").selectExpr(
        "s", f"{hex8_to_long_sql('substring(md5(s), 1, 8)')} AS h"
    )
    got = {r["s"]: r["h"] for r in df.collect()}
    for v in vals:
        assert got[v] == int(hashlib.md5(v.encode()).hexdigest()[:8], 16)


def test_morton_key_is_bijective_and_orders_tiles(spark):
    """Morton interleave must be injective over the 16-bit domain and
    its python mirror (so the z-tiles partition rows, not mix them)."""
    from strategy_analyzer_exporter_spark.operators.finance import (
        MORTON_BITS,
        _morton_terms,
    )

    def py_morton(a: int, b: int) -> int:
        out = 0
        for i in range(MORTON_BITS):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    pairs = [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 2, 7, 1024, 65535)]
    df = spark.createDataFrame(pairs, "a long, b long").selectExpr(
        "a", "b", f"{_morton_terms('a', 'b')} AS mk"
    )
    got = {(r["a"], r["b"]): r["mk"] for r in df.collect()}
    assert got == {(a, b): py_morton(a, b) for a, b in pairs}
    assert len(set(got.values())) == len(pairs)  # injective


def test_corpus_clean_exchange_budget(spark):
    """One content-hash window shuffle + one final aggregation — the
    whole cleaning pass must not re-shuffle the corpus further."""
    q = QUERIES["corpus_clean_pipeline"](spark, SF)
    assert P.count_exchanges(q) <= 2, P.physical_plan(q)


def test_bloom_decontamination_equals_exact(spark):
    """The Bloom filter is a probe-side reducer, never a decider: its
    output must equal decontaminate_ngram's exactly (same docs, same
    hit counts) with bloom_caught TRUE everywhere — a build/probe hash
    mismatch would drop a true gram and fail this before it ever
    reached the driver gate."""
    exact = {
        r["doc_id"]: r["n_hit_grams"]
        for r in QUERIES["decontaminate_ngram"](spark, SF).collect()
    }
    rows = QUERIES["decontaminate_bloom"](spark, SF).collect()
    assert {r["doc_id"]: r["n_hit_grams"] for r in rows} == exact
    assert all(r["bloom_caught"] for r in rows)
