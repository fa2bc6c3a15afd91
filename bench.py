"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query wall seconds.

Protocol: each query runs SPARK_GRAFT_REPS times (default 5) in one warm
session; the reported per-query number is the MEDIAN and `spread` carries
[min, max] — single warm runs proved unable to support the 2x gate
(byte-identical code moved +-30% between rounds 2 and 3; see BASELINE.md).

Query set mirrors BASELINE.md B1-B8 plus the LLM-pipeline headliners.
Each query is fully materialized via a count-style action (no driver-side
collect of data rows).

Scale mode: SPARK_GRAFT_SCALE=N (N > 1) benches an N-times-replicated
copy of the input (each replica's key columns shifted by a disjoint
offset, so joins/sequences stay within their replica — referential
integrity preserved). With the sf0.1 inputs, SCALE=10 approximates sf1:
enough rows that the pandas-path operators' fixed Python-worker cost
amortizes and regressions in per-row cost become visible. The scaled
copy is derived once into .benchdata/ and reused; the default (no env)
behavior is untouched for the driver.

Caveat: replication clones document texts, so every doc gains N-1
exact near-duplicates — minhash_pairs becomes a clone-heavy dedup
stress (true-pair count grows ~N^2/2 per text) rather than a
same-density corpus. Measured at SCALE=10 (≈sf1, 2026-08-13):
total 50.7s — q1_agg 0.52, multi_join 1.06, distinct_on 1.52,
match_funnel 3.97 (fixed pandas cost amortized: 1.2x for 10x rows),
split_intervals 2.90, window_tier 0.78, expmovavg 0.90,
minhash_pairs 37.2 (~227k true clone pairs), cosine_topk 0.58,
quality_scores 0.38, dedup_exact 0.64.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings"

# key columns shifted per replica (uniform offset keeps every equality
# join consistent within a replica; non-key attributes untouched)
_KEY_COLS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

_OFFSET = 100_000_000


def ensure_scaled_dir(spark, base_dir: str, factor: int, salt_docs: bool = False) -> str:
    from pyspark.sql import functions as F

    base_sf = os.path.basename(os.path.normpath(base_dir))
    suffix = "s" if salt_docs else ""
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".benchdata", f"{base_sf}x{factor}{suffix}"
    )
    marker = os.path.join(out_dir, "_SCALED_OK")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES.split():
        src = spark.read.parquet(os.path.join(base_dir, f"{name}.parquet"))
        parts = []
        for i in range(factor):
            rep = src
            for c in _KEY_COLS[name]:
                # int key cols overflow at offset*factor > 2^31: widen to
                # bigint (both join sides widen consistently)
                dt = src.schema[c].dataType.simpleString()
                target = "bigint" if dt in ("int", "smallint") else dt
                rep = rep.withColumn(c, (F.col(c) + F.lit(i * _OFFSET)).cast(target))
            if salt_docs and name == "documents":
                # make replicas NON-duplicate (distinct token appended):
                # keeps near-dup density constant with scale, so minhash
                # measures same-density throughput instead of the clone-
                # cluster quadratic stress (see module docstring caveat)
                rep = rep.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" replica{i}token"))
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scale = int(os.environ.get("SPARK_GRAFT_SCALE", "1"))
    import __spark_entry__ as entry
    from sclera_spark.session import build_session

    spark = build_session(app_name="sclera-bench")
    base_sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", "") or 0)
    if scale > 1:
        sf_dir = ensure_scaled_dir(
            spark, sf_dir, scale,
            salt_docs=bool(int(os.environ.get("SPARK_GRAFT_SALT_DOCS", "0"))),
        )
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
        "align_sql",         # B8 banded-DTW alignment (pandas path)
        "expmovavg",
        "minhash_pairs",     # LLM tier: MinHash-LSH near-dup
        "cosine_topk",       # LLM tier: similarity search
        "quality_scores",    # LLM tier: text analysis
        "dedup_exact",
    ]
    bench_names = [n for n in bench_names if n in qs]
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        wanted = {n.strip() for n in only.split(",") if n.strip()}
        bench_names = [n for n in bench_names if n in wanted]
    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "5")))

    # warm the JVM + parquet footers once
    qs["q1_agg"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # ...and the Python worker pool: the first pandas-UDF stage pays the
    # per-core worker spawn (~4 s at local[32]); without this, whichever
    # pandas-path query runs first absorbs that one-off cost into its reps
    import pandas as _pd  # noqa: F401

    (
        spark.range(spark.sparkContext.defaultParallelism * 4)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(lambda it: it, "id long")
        .write.format("noop").mode("overwrite").save()
    )

    import statistics

    results: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in bench_names:
        times: list[float] = []
        for _ in range(reps):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        results[name] = round(statistics.median(times), 3)
        spread[name] = [round(min(times), 3), round(max(times), 3)]

    total = round(sum(results.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": results,
                "spread": spread,
                "reps": reps,
                "sf": base_sf * scale,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
