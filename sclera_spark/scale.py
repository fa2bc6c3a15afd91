"""Scale guards for operators with sequential (single-sequence) modes.

Several sequence operators (MATCH, EXPMOVAVG, Transform) replicate the
reference's single-threaded whole-input semantics when called without
partition keys by coalescing to one task. That is correct but serializes
the entire input through one executor core — fine for bounded data,
a scale-killer on a 100 TB cluster run. These paths warn loudly so the
fallback is never silent in a pipeline.

Memory note (r12): MATCH's single-task fallback is CPU-serialized but
no longer memory-unbounded — the chunked partition matcher keeps only
the open attempt tail resident (operators/match/matcher.py
MAX_ATTEMPT_ROWS), so even a 100M-row single group streams through in
Arrow-batch-sized memory. ALIGN's DP still materializes both aligned
series per partition key (inherent to banded DTW)."""

from __future__ import annotations

import warnings


class UnpartitionedFallbackWarning(UserWarning):
    """An operator fell back to a single-task sequential plan."""


def warn_unpartitioned(op: str, hint: str = "pass partition_by") -> None:
    warnings.warn(
        f"{op} without partition keys runs the whole input through a single "
        f"task (sequential semantics, zero parallelism) — {hint} to "
        f"distribute",
        UnpartitionedFallbackWarning,
        stacklevel=3,
    )


def keyed_repartition(df, cols):
    """Hash-repartition by key columns with the partition count PINNED to
    spark.sql.shuffle.partitions.

    ``df.repartition(*cols)`` without a count lets AQE coalesce the
    exchange by byte size — and pandas-operator inputs are byte-small but
    CPU-heavy, so AQE routinely folds them into ONE task (measured: the
    sf0.1 ALIGN bench collapsed to a single partition, serializing 3 s of
    DP work into 10 s of wall). An explicit count disables coalescing for
    this exchange only, leaving AQE on for the rest of the plan."""
    from pyspark.sql import functions as F

    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, *[F.col(c) for c in cols])


def salted_join(big, small, on, how: str = "inner", salt: int = 16, seed: int = 42):
    """Skew-safe equi-join: salt the big side's rows across ``salt``
    buckets and replicate the small side into every bucket, so one hot
    key spreads over ``salt`` tasks instead of melting a single reducer.

    AQE's skew-join splitting already covers sort-merge joins at runtime;
    this helper is for the cases AQE cannot rebalance — e.g. a hot key in
    a shuffled hash join with a small-but-over-broadcast-threshold right
    side, or a deliberately pre-partitioned pipeline. Only inner/left
    joins are semantics-safe under replication of the small side."""
    from pyspark.sql import functions as F

    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins only")
    keys = [on] if isinstance(on, str) else list(on)
    bs = big.withColumn("__salt", (F.rand(seed) * salt).cast("int"))
    ss = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return bs.join(ss, on=keys + ["__salt"], how=how).drop("__salt")


def bucketed_write(
    df,
    name: str,
    keys,
    n_buckets: int,
    sort_by=None,
    path: str | None = None,
    mode: str = "overwrite",
):
    """Materialize ``df`` as a BUCKETED table: rows hash-partitioned into
    ``n_buckets`` files per partition by ``keys`` (optionally sorted
    within buckets), registered as ``name`` in the session catalog.

    This is the 100 TB co-location story: two tables bucketed on the same
    keys with the same bucket count join WITHOUT a shuffle on either side
    (Catalyst's EnsureRequirements sees the bucket spec as satisfied
    hash distribution) — the single biggest exchange saver for repeated
    fact-to-fact joins. Sorted buckets additionally skip the sort phase
    of a sort-merge join. The bucket spec lives in the catalog, so reads
    must go through ``spark.table(name)`` (not path reads).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort_by:
        sort_by = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sort_by)
    if path:
        w = w.option("path", path)
    w.saveAsTable(name)
    return df.sparkSession.table(name)
