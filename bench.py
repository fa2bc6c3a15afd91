"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query wall seconds.

Query set mirrors BASELINE.md B1-B7 plus the LLM-pipeline headliners.
Each query is fully materialized via a count-style action (no driver-side
collect of data rows).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry
    from sclera_spark.session import build_session

    spark = build_session(app_name="sclera-bench")
    qs = entry.queries()
    qs.update(getattr(entry, "bench_extra_queries", dict)())

    bench_names = [
        "q1_agg",            # B1 scan+filter+group+sort
        "multi_join",        # B2 multi-join with filters
        "distinct_on",       # B3 distinct-on top-1
        "unpivot",           # B4 reshaping
        "match_funnel",      # B5 sequence matcher
        "split_intervals",   # B6 disjoint intervals
        "window_tier",       # B7 running aggregates
        "expmovavg",
        "minhash_pairs",     # LLM tier: MinHash-LSH near-dup
        "cosine_topk",       # LLM tier: similarity search
        "quality_scores",    # LLM tier: text analysis
        "dedup_exact",
    ]
    bench_names = [n for n in bench_names if n in qs]

    # warm the JVM + parquet footers once
    qs["q1_agg"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    results: dict[str, float] = {}
    for name in bench_names:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        results[name] = round(time.time() - t0, 3)

    total = round(sum(results.values()), 3)
    sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", "") or 0)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
