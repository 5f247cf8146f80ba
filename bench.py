"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <scale factor>, ...extras}

Each query is forced to full materialization with the noop sink (count()
alone would let Catalyst prune final projections). The flagship feature
pipeline additionally reports rows/s to mirror the reference's bars/s
throughput print (StrategyAnalyzerExporter.cs:240-245).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline set: the reference-pipeline equivalent + the heaviest
# representative of each operator family
HEADLINE = (
    "features_flagship",
    "agg_pricing_summary",
    "join_multiway",
    "join_asof",
    "window_topk_per_group",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_bruteforce_topk",
    "similarity_lsh_ann",
    "text_quality_score",
    "kmeans_embeddings",
    "corpus_clean_pipeline",
    "pack_sequences",
    "streaming_features",
)

# queries whose work happens INSIDE the query fn (a stream runs to
# completion and returns a memory-table result) — time the fn call, not
# a noop save of the (tiny, already-materialized) result
STREAMING = {"streaming_features"}

TRIALS = 3  # report median-of-3 — guards against one-off JIT/GC noise


def main() -> None:
    from strategy_analyzer_exporter_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")
    queries = entrymod.queries()

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    results: dict[str, float] = {}
    extras: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        times: list[float] = []
        if name in STREAMING:
            fn(spark, SF_DIR)  # warm-up (stream machinery + state codec)
            for _ in range(TRIALS):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                times.append(time.perf_counter() - t0)
        else:
            # warm-up: JVM JIT of generated code dominates cold runs
            # (observed 50-100s cold vs ~3s warm on md5-heavy plans).
            # Reuse the SAME DataFrame for warm-up and timing —
            # rebuilding the plan would re-generate (and re-JIT) the
            # code. Two warm-ups: C2 compilation is still finishing
            # after the first.
            df = fn(spark, SF_DIR)
            for _ in range(2):
                df.write.format("noop").mode("overwrite").save()
            for _ in range(TRIALS):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]  # median
        results[name] = round(dt, 3)
        if name == "features_flagship":
            n = fn(spark, SF_DIR).count()
            extras["features_rows"] = n
            extras["features_rows_per_s"] = round(n / dt, 1)

    total = round(sum(results.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": sf,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
