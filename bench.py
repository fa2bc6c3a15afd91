"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line with per-query wall seconds.

Protocol (r6): one untimed warm-up rep per query (pays Catalyst
compilation / whole-stage-codegen JIT / AQE re-plan — measured at 3-5 s for
the most plan-heavy query vs a 1.5-1.9 s steady state), then
SPARK_GRAFT_REPS (default 7) timed reps taken in ROUND-ROBIN passes over
the whole query list; per query the MEDIAN is reported in `queries`, the
MIN in `min`, [min, max] in `spread`. Round-robin because the measured
host failure mode is multi-second external stall bursts (identical code
spread [1.4, 13.9] s within one run): consecutive reps all absorb a burst,
interleaved reps don't. Per-query budgets (2x the frozen anchors) are
asserted on the MIN (one-sided noise can't lower a min; a real regression
raises it): violations go to stderr and the `budget_violations` JSON
field, so a regression fails loudly instead of riding the total.
r5's "8.3 s split_intervals" was the cold-rep + stall-burst artifact —
see BASELINE.md.

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
same-density corpus; SPARK_GRAFT_SALT_DOCS=1 appends a distinct token
per replica to keep density constant. Current ~sf1 measurements under
protocol v3 live in BASELINE.md ("~sf1 under protocol v3"): total
35.95 s for 10x the rows, every query at or below linear.
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


# ---- storage-tier entries (r9): the data-skipping win, frozen ----
#
# A manifest table clustered on o_orderkey (8 range files, sorted
# within) is built once per sf dir under .benchdata/ and reused. Two
# measured pairs regression-guard what r8/r9 built:
#   storage_range_probe      vs storage_range_probe_full  — file-level
#     skipping on a ~5% key window vs SET manifest_pruning=off on the
#     SAME data (the pruned/full ratio is the 100 TB claim);
#   storage_meta_agg         vs storage_count_scan        — zero-job
#     metadata-only count/min/max vs the forced scan.
_STORAGE_ENV: dict = {}


def _storage_env(spark, sf_dir: str):
    key = (id(spark), sf_dir)
    if _STORAGE_ENV.get("key") == key:
        return _STORAGE_ENV["env"]
    from sclera_spark.engine import ScleraEngine
    from sclera_spark.sources.manifest import ManifestTable

    base_sf = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".benchdata",
        f"manifest_{base_sf}",
        "bm_orders",
    )
    if not ManifestTable.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        from pyspark.sql import functions as F

        # 16x-replicated orders (keys offset per replica, so the key
        # space stays meaningfully ordered), range-clustered into 32
        # files: big enough that "open every file" visibly loses to
        # "open the overlapping files" even on a warm local FS — the
        # shape one clustered 100 TB fact table has, in miniature
        base = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        parts = [
            base.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(i * _OFFSET)
            )
            for i in range(16)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df = df.repartitionByRange(32, "o_orderkey").sortWithinPartitions(
            "o_orderkey"
        )
        ManifestTable.create(df, path)
    eng = ScleraEngine(spark)
    ddl = eng.ddl()
    ddl.managed["bm_orders"] = path
    ddl.manifest_tables.add("bm_orders")
    ddl._register_manifest("bm_orders")
    # probe window = the middle ~5% of the key span, from stats alone
    mt = ManifestTable(path)
    mins, maxs = [], []
    for st in mt.file_stats().values():
        if "o_orderkey" in st:
            mins.append(st["o_orderkey"][0])
            maxs.append(st["o_orderkey"][1])
    k0, k1 = min(mins), max(maxs)
    lo = k0 + int((k1 - k0) * 0.40)
    hi = k0 + int((k1 - k0) * 0.45)
    env = (eng, lo, hi)
    _STORAGE_ENV.update(key=key, env=env)
    return env


def _storage_queries() -> dict:
    def _probe_sql(lo, hi):
        return (
            "SELECT sum(o_totalprice) AS s, count(*) AS n FROM bm_orders "
            f"WHERE o_orderkey BETWEEN {lo} AND {hi}"
        )

    def range_probe(spark, sf_dir):
        eng, lo, hi = _storage_env(spark, sf_dir)
        return eng.sql(_probe_sql(lo, hi))

    def range_probe_full(spark, sf_dir):
        eng, lo, hi = _storage_env(spark, sf_dir)
        eng.config["manifest_pruning"] = "off"
        try:
            return eng.sql(_probe_sql(lo, hi))
        finally:
            eng.config.pop("manifest_pruning", None)

    meta_sql = (
        "SELECT count(*) AS n, min(o_orderkey) AS lo, "
        "max(o_orderkey) AS hi FROM bm_orders"
    )

    def meta_agg(spark, sf_dir):
        eng, _, _ = _storage_env(spark, sf_dir)
        return eng.sql(meta_sql)

    def count_scan(spark, sf_dir):
        eng, _, _ = _storage_env(spark, sf_dir)
        eng.config["metadata_only_count"] = "off"
        try:
            return eng.sql(meta_sql)
        finally:
            eng.config.pop("metadata_only_count", None)

    return {
        "storage_range_probe": range_probe,
        "storage_range_probe_full": range_probe_full,
        "storage_meta_agg": meta_agg,
        "storage_count_scan": count_scan,
    }


# per-query budget gate: 2x the frozen r13 anchors (BASELINE.md "r13
# anchor re-freeze": min-of-7 across TWO independent protocol-v3 runs
# at r13 HEAD, sf0.1, local[32] — replacing the r1 single-warm-run
# anchors, which mixed older, simpler plans; the r1 table stays in
# BASELINE.md for history). Gated on the per-query MIN across reps,
# not the median: external stall bursts are one-sided noise (they only
# ADD time), so the min is the robust estimator of the code's true
# cost — a real regression raises the min; a hypervisor stall does not
# lower it.
BUDGETS = {
    "q1_agg": 0.65, "multi_join": 0.45, "distinct_on": 0.75,
    "unpivot": 0.1, "match_funnel": 1.2, "split_intervals": 3.4,
    "window_tier": 0.6, "align_sql": 1.9, "expmovavg": 0.9,
    "minhash_pairs": 3.3, "cosine_topk": 0.4, "quality_scores": 0.6,
    "dedup_exact": 0.45,
    # storage tier: the meta/scan pair guards the zero-job path staying
    # zero-job; the probe pair guards the pruning machinery's fixed
    # overhead staying bounded (wall-clock parity with the full scan is
    # EXPECTED locally — see BASELINE.md). r14: widened from 2x to
    # ~2.5x the frozen anchors — these are the sub-second entries where
    # 2x left single-digit-% headroom against measured host-weather
    # days (r13 driver run: storage_range_probe min 0.185 vs 0.20
    # budget on a day EVERY min inflated 1.5-2x, including the zero-job
    # storage_meta_agg path that cannot have regressed); a real plan
    # regression is >2.5x for these fixed-overhead probes.
    "storage_range_probe": 0.22, "storage_range_probe_full": 0.20,
    "storage_meta_agg": 0.62, "storage_count_scan": 0.86,
    # pack_sequences: 2x its 0.543 anchor left only 5% headroom under a
    # measured host-noise day where EVERY min ran 1.2-2x (late r13,
    # BASELINE.md: old-vs-new interleaved A/B mins 1.25 / 1.06 on the
    # same code-equivalent plans) — widened to keep the gate a
    # regression detector, not a host-weather detector
    "pack_sequences": 1.4, "cross_dedup": 4.6,
    # r13 additions, NOT in the default headline set (totals stay
    # comparable to the r13 anchor): gate via SPARK_GRAFT_ONLY.
    # 2x observed sf0.1 mins (4.561 / 1.309, min-of-5)
    "semantic_dedup": 9.2, "ann_recall": 2.7,
    # late-r13 additions (same regime; mins 5.03 / 0.50 / 5.37,
    # min-of-5 on a stall-bursty host — see BASELINE.md)
    "crawl_gate_incr": 10.1, "token_budget": 1.0,
    "quality_classifier": 10.8,
    # r14 additions (same regime; mins 3.861 / 1.389, min-of-5 at
    # sf0.1): eight queries through one shared scan + assignment pass;
    # the 3-batch streaming budget-gate replay
    "ann_recall_sweep": 7.8, "stream_token_budget": 2.8,
}

# frozen per-query anchor MINS (BASELINE.md "r13 anchor re-freeze":
# min across two independent protocol-v3 runs at r13 HEAD, sf0.1,
# local[32]). Used to emit `anchor_ratio_min` — the min-basis total of
# THIS run over the frozen anchor total for the same query set — so
# the JSON self-describes regression-vs-host-weather: uniform
# inflation of every min (including zero-job paths) with
# anchor_ratio_min drifting together is weather; one query's min
# spiking alone is a regression (and trips its budget).
ANCHORS_MIN = {
    "q1_agg": 0.316, "multi_join": 0.219, "distinct_on": 0.369,
    "unpivot": 0.043, "match_funnel": 0.581, "split_intervals": 1.690,
    "window_tier": 0.277, "align_sql": 0.933, "expmovavg": 0.430,
    "minhash_pairs": 1.631, "cosine_topk": 0.199,
    "quality_scores": 0.286, "dedup_exact": 0.204,
    "pack_sequences": 0.543, "cross_dedup": 2.290,
    "storage_range_probe": 0.088, "storage_range_probe_full": 0.079,
    "storage_meta_agg": 0.248, "storage_count_scan": 0.344,
    # off-headline entries (SPARK_GRAFT_ONLY), min-of-5 freezes
    "semantic_dedup": 4.561, "ann_recall": 1.309,
    "crawl_gate_incr": 5.03, "token_budget": 0.50,
    "quality_classifier": 5.37, "ann_recall_sweep": 3.861,
    "stream_token_budget": 1.389,
}

# ~sf1 budget gate (r12 freeze, BASELINE.md "r12 ~sf1 freeze"):
# SPARK_GRAFT_SCALE=10 over the sf0.1 dir — the scale where plan
# defects in the storage + LLM tiers actually show. 2x the frozen
# min-of-3 anchors; span_dups/stream_upsert get 2.5x (their observed
# stall-burst spreads at this scale are the widest, and reps are few).
# Run: SPARK_GRAFT_SCALE=10 SPARK_GRAFT_REPS=3 SPARK_GRAFT_ONLY=... bench.py
BUDGETS_SCALE10 = {
    "storage_range_probe": 0.45, "storage_range_probe_full": 0.25,
    "storage_meta_agg": 0.65, "storage_count_scan": 1.2,
    "cross_dedup": 12.5, "pack_sequences": 1.6,
    "span_dups": 19.5, "stream_upsert": 35.0,
    # late-r13 ops (2.5x mins-of-3 on a stall-bursty host: 15.8 / 1.57
    # / 9.0 — crawl gate and budget draw scale 3.1x for 10x docs,
    # classifier near-flat; BASELINE.md "late-r13 ~sf1")
    "crawl_gate_incr": 40.0, "token_budget": 4.0,
    "quality_classifier": 22.5,
    # r14 ops at ~sf1 (2.5x mins-of-3 on a stall-bursty host: 3.834 /
    # 1.271 — the sweep is near scale-neutral: the shared scan grows
    # 10x but the two-phase window and probe-pruned candidate set
    # dominate; BASELINE.md "r14 ~sf1")
    "ann_recall_sweep": 9.6, "stream_token_budget": 3.2,
}


def check_budgets(
    best: dict[str, float], base_sf: float, scale: int
) -> list[dict]:
    """Budgets apply at the calibrated points — sf0.1 unreplicated
    (BUDGETS) and sf0.1 x10 (BUDGETS_SCALE10, the ~sf1 storage/LLM
    gate); returns the violation records (empty = all inside)."""
    if abs(base_sf - 0.1) > 1e-9:
        return []
    table = (
        BUDGETS if scale == 1 else BUDGETS_SCALE10 if scale == 10 else {}
    )
    return [
        {"query": name, "min": mn, "budget": table[name]}
        for name, mn in best.items()
        if name in table and mn > table[name]
    ]


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
    qs.update(_storage_queries())

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
        "pack_sequences",    # LLM tier: concat-and-chunk packing (late r9)
        "cross_dedup",       # LLM tier: crawl-ingest gate (late r9)
        "storage_range_probe",       # file-level data skipping ON
        "storage_range_probe_full",  # same probe, pruning OFF
        "storage_meta_agg",          # zero-job count/min/max
        "storage_count_scan",        # same aggregate, forced scan
    ]
    bench_names = [n for n in bench_names if n in qs]
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        # ONLY may name ANY queries() entry (not just the headline set):
        # the ~sf1 sweeps for promoted entries run through the same
        # warm-up + round-robin protocol
        wanted = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in wanted if n not in qs]
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_ONLY: unknown queries {unknown}")
        bench_names = wanted
    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "7")))

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

    # one untimed warm-up rep per query: Catalyst plan compilation +
    # codegen JIT + AQE stage materialization is a per-(query, session)
    # one-off, not per-run throughput — measure steady state
    for name in bench_names:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # ROUND-ROBIN passes (pass 1: q1..qN, pass 2: q1..qN, ...) instead of
    # consecutive per-query reps: the measured host failure mode is a
    # multi-second external stall BURST (spreads like [1.4, 13.9] s on
    # byte-identical code) — consecutively-run reps of one query all
    # absorb the burst and its median lies; interleaving spreads a burst
    # across different queries' single reps, so per-query medians hold.
    all_times: dict[str, list[float]] = {n: [] for n in bench_names}
    for _ in range(reps):
        for name in bench_names:
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            all_times[name].append(time.time() - t0)

    results: dict[str, float] = {}
    best: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name, times in all_times.items():
        results[name] = round(statistics.median(times), 3)
        best[name] = round(min(times), 3)
        spread[name] = [round(min(times), 3), round(max(times), 3)]

    violations = check_budgets(best, base_sf, scale)
    for v in violations:
        print(
            f"BUDGET VIOLATION: {v['query']} min-of-{reps} {v['min']}s "
            f"> {v['budget']}s",
            file=sys.stderr,
        )

    total = round(sum(results.values()), 3)
    # min-basis signals (protocol v3: the per-query MIN is the
    # authoritative estimator on this stall-bursty host — one-sided
    # noise can only ADD time). anchor_ratio_min compares this run's
    # min-sum to the frozen BASELINE.md anchor min-sum over the SAME
    # queries, so the JSON self-describes weather-vs-regression:
    # ratio ~1 with an inflated median total = stall bursts; ratio
    # itself >> 1 = investigate (per-query budgets name the culprit).
    min_total = round(sum(best.values()), 3)
    anchored = [n for n in best if n in ANCHORS_MIN]
    anchor_ratio = (
        round(
            sum(best[n] for n in anchored)
            / sum(ANCHORS_MIN[n] for n in anchored),
            3,
        )
        if anchored and scale == 1 and abs(base_sf - 0.1) < 1e-9
        else None
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": results,
                "min": best,
                "min_total_sec": min_total,
                "anchor_ratio_min": anchor_ratio,
                "spread": spread,
                "reps": reps,
                "warmup_reps": 1,
                "budget_violations": violations,
                "sf": base_sf * scale,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
