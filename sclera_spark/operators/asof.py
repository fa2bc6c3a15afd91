"""As-of (temporal/ordered) join — for each left row, the most recent
right row at or before its key (backward), or the earliest at or after
(forward), optionally per group and within a tolerance.

No reference counterpart (the reference joins are equi/theta —
RelOp.scala join tier); this is the extension-tier operator a
time-series or feature-store workload needs (pandas ``merge_asof`` /
DuckDB ``ASOF JOIN`` semantics).

Spark-first plan: NOT an inequality join (Catalyst would make that a
broadcast-nested-loop — quadratic per group). Both sides are tagged and
unioned, then ONE window pass per (by, key) ordering carries the latest
right-side payload forward (``last(payload, ignorenulls=True)`` over an
unbounded-preceding frame) — a single shuffle on the group keys, linear
in rows, identical cost shape to the engine's other sequence operators.
Ties at equal key: the right row sorts before the left row (side
ordering), so matches are inclusive.

Skew: the shuffle is keyed by ``by`` — a hot group would funnel to one
task, so asof_join AUTO-SPLITS dominant groups (r6): a cheap sampled
count detects groups estimated past ``hot_group_threshold`` rows; their
key range is cut into ``hot_group_buckets`` range buckets (quantiles
from the same sample), the carry-forward runs as a two-pass parallel
prefix — bucket-local window, then a per-(group, bucket) summary window
over ~buckets rows — and the incoming carry broadcasts back. Cold
groups keep the single-window plan unchanged. Detection costs one
sample-count job (fraction ``skew_sample_fraction``); pass
``hot_group_threshold=None`` to skip it. The job is GATED (r7): skipped
on streaming inputs and on inputs Catalyst's size estimate proves too
small to contain a hot group, and its result is cached per analyzed
plan — a second asof_join over an unchanged table runs zero sample
jobs, while a manifest-table commit changes the plan (new file list)
and invalidates exactly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _key_ord(u: DataFrame):
    """Numeric ordering value for the tagged key column: timestamps
    (incl. NTZ) and dates go through a timestamp->double cast (epoch
    seconds, monotonic); numerics cast to double directly."""
    dt = dict(u.dtypes)["__k"]
    if dt.startswith("timestamp") or dt == "date":
        return F.col("__k").cast("timestamp").cast("double")
    return F.col("__k").cast("double")


# Sampled skew stats are cached per (left plan, right plan, by, knobs):
# repeated asof joins over an UNCHANGED table skip the sample job
# entirely (ADVICE r6 / verdict #5 — at 100 TB the 1% sample is itself
# a scan). Keyed by the analyzed plans' semanticHash, so a manifest
# table read — an explicit per-version file list — invalidates exactly
# on commit. Staleness is safe by construction: the hot map only picks
# the PLAN (split vs single window), never the answer, so a stale entry
# costs performance at worst. Bounded FIFO; observable via SKEW_STATS
# for the plan-quality gate.
_SKEW_CACHE: dict[tuple, dict] = {}
_SKEW_CACHE_MAX = 256
SKEW_STATS = {"detect_jobs": 0, "cache_hits": 0}


def _plan_id(df: DataFrame) -> int | None:
    try:
        return df._jdf.queryExecution().analyzed().semanticHash()
    except Exception:
        return None


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for the plan — file bytes for scans,
    propagated through operators. Reading it runs NO Spark job."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None


def _plan_row_count(df: DataFrame) -> int | None:
    """Catalyst's row-count estimate when the plan carries one (CBO
    stats, LocalRelation, or a propagated limit). Runs NO Spark job.
    Preferred over the byte estimate for thresholds expressed in rows:
    parquet RLE/dictionary compression can store large repetitive
    tables — exactly the skewed-key shape — below 1 byte/row, which
    would make a bytes>=rows comparison silently skip detection."""
    try:
        opt = df._jdf.queryExecution().optimizedPlan().stats().rowCount()
        if opt.isDefined():
            return int(opt.get().longValue())
    except Exception:
        pass
    return None


def _detect_hot_groups(
    u: DataFrame,
    by: Sequence[str],
    threshold: int,
    fraction: float,
    buckets: int = 32,
) -> dict[tuple, list[float]]:
    """One sampled pass: estimated per-group row counts AND the hot
    groups' key quantiles (the future bucket boundaries) in a single
    aggregation job. Driver state is bounded by #hot-groups x buckets —
    a handful of rows, never data."""
    kd = _key_ord(u)
    probs = [i / buckets for i in range(1, buckets)]
    agg = (
        u.sample(False, fraction, seed=42)
        .groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.percentile_approx(kd, probs, 10_000).alias("__q"),
        )
        .filter(F.col("__n") > threshold * fraction)
    )
    hot: dict[tuple, list[float]] = {}
    for row in agg.collect():
        g = tuple(row[c] for c in by)
        if any(v is None for v in g):
            continue  # null group keys: leave on the unsplit path
        bnds = sorted({x for x in (row["__q"] or []) if x is not None})
        if bnds:
            hot[g] = bnds
    return hot


def _carry_split(
    u: DataFrame,
    by: Sequence[str],
    direction: str,
    hot: dict[tuple, list[float]],
    buckets: int,
) -> DataFrame:
    """Two-pass parallel prefix for the carry-forward: hot groups get a
    range-bucket column (cold groups: bucket 0), the window runs per
    (group, bucket), and each bucket's incoming carry comes from a
    window over the tiny per-bucket summary table, broadcast back.
    Semantically identical to the single window; wall-clock bounded by
    rows/buckets for the hottest group instead of its full size."""
    from functools import reduce

    backward = direction == "backward"
    kd = _key_ord(u)
    bucket = F.lit(0)
    for g, bnds in hot.items():
        cond = reduce(
            lambda a, b: a & b,
            [F.col(c) == F.lit(v) for c, v in zip(by, g)],
        )
        cmp_ = (lambda t: kd >= F.lit(t)) if backward else (lambda t: kd <= F.lit(t))
        expr = None
        for t in bnds:
            inc = F.when(cmp_(t), 1).otherwise(0)
            expr = inc if expr is None else expr + inc
        bucket = F.when(cond, expr).otherwise(bucket)
    ub = u.withColumn("__bk", bucket)

    key = (
        F.col("__k").asc_nulls_first()
        if backward
        else F.col("__k").desc_nulls_first()
    )
    wl = (
        Window.partitionBy(*by, "__bk")
        .orderBy(key, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ub = ub.withColumn("__ml", F.last("__p", ignorenulls=True).over(wl))

    # per-bucket summary: the LAST right payload in window order
    # (max_by on the ordering value; left rows excluded via null ord)
    ordv = kd if backward else -kd
    summ = ub.groupBy(*by, "__bk").agg(
        F.max_by(
            F.when(F.col("__side") == 0, F.col("__p")),
            F.when(F.col("__side") == 0, ordv),
        ).alias("__s")
    )
    wi = (
        Window.partitionBy(*by)
        .orderBy(F.col("__bk").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    inc = summ.withColumn(
        "__inc", F.last("__s", ignorenulls=True).over(wi)
    ).select(*by, "__bk", F.col("__inc").alias("__incp"))
    joined = ub.join(F.broadcast(inc), on=list(by) + ["__bk"], how="left")
    return joined.withColumn("__m", F.coalesce(F.col("__ml"), F.col("__incp")))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    direction: str = "backward",
    tolerance: str | None = None,
    how: str = "left",
    suffix: str = "_r",
    hot_group_threshold: int | None = 2_000_000,
    hot_group_buckets: int = 32,
    skew_sample_fraction: float = 0.01,
) -> DataFrame:
    """For each left row: the matching right row with the greatest
    ``right.on <= left.on`` (backward) or smallest ``right.on >=
    left.on`` (forward), within the same ``by`` group.

    ``tolerance``: max allowed key distance as a SQL interval body for
    timestamp keys (e.g. ``'30' MINUTE``) or a numeric literal for
    numeric keys; matches farther away become NULL (left) / drop
    (inner). ``how``: 'left' keeps unmatched left rows, 'inner' drops
    them. Right payload columns colliding with left names get
    ``suffix``."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    by = list(by)
    for c in by:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"by column {c!r} must exist on both sides")
    if on not in left.columns or on not in right.columns:
        raise ValueError(f"on column {on!r} must exist on both sides")
    if not by:
        from sclera_spark.scale import warn_unpartitioned

        warn_unpartitioned("asof_join", hint="pass by=[...]")

    payload_cols = [c for c in right.columns if c != on and c not in by]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload_cols
    }

    # right rows with a NULL key can never match; left NULL-key rows sort
    # before every right row (nulls-first both directions) -> no match
    r = right.filter(F.col(on).isNotNull()).select(
        *[F.col(c) for c in by],
        F.col(on).alias("__k"),
        F.struct(
            F.col(on).alias("__rk"), *[F.col(c) for c in payload_cols]
        ).alias("__p"),
        F.lit(0).alias("__side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
            for c in left.columns
        ],
    )
    l = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("__k"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    u = l.unionByName(r)

    key = (
        F.col("__k").asc_nulls_first()
        if direction == "backward"
        else F.col("__k").desc_nulls_first()
    )
    # Hot-group detection is an eager sample job — gate it (ADVICE r6):
    # never on streaming inputs (sample+collect is illegal there), never
    # when Catalyst's size estimate proves no group can reach the
    # threshold (≥1 byte/row floor — reading the estimate runs no job),
    # and serve repeated calls over unchanged plans from the cache.
    hot: dict[tuple, list[float]] = {}
    if by and hot_group_threshold and not u.isStreaming:
        # Prefer a ROW estimate when Catalyst carries one (the threshold
        # is in rows); fall back to the byte estimate with its ≥1
        # byte/row floor only when no row count is available. The byte
        # fallback can under-estimate heavily RLE-compressed skewed
        # tables (see _plan_row_count) but errs only toward a skipped
        # optimization, never a wrong result.
        rows = _plan_row_count(u)
        est = rows if rows is not None else _plan_size_bytes(u)
        if est is None or est >= hot_group_threshold:
            ck = (
                _plan_id(left),
                _plan_id(right),
                tuple(by),
                on,
                hot_group_threshold,
                skew_sample_fraction,
                hot_group_buckets,
            )
            cacheable = ck[0] is not None and ck[1] is not None
            if cacheable and ck in _SKEW_CACHE:
                SKEW_STATS["cache_hits"] += 1
                hot = _SKEW_CACHE[ck]
            else:
                SKEW_STATS["detect_jobs"] += 1
                hot = _detect_hot_groups(
                    u, by, hot_group_threshold, skew_sample_fraction
                )
                if cacheable:
                    if len(_SKEW_CACHE) >= _SKEW_CACHE_MAX:
                        _SKEW_CACHE.pop(next(iter(_SKEW_CACHE)))
                    _SKEW_CACHE[ck] = hot
    if hot:
        matched = _carry_split(
            u, by, direction, hot, hot_group_buckets
        ).filter(F.col("__side") == 1)
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(key, F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.withColumn(
            "__m", F.last("__p", ignorenulls=True).over(w)
        ).filter(F.col("__side") == 1)

    valid = F.col("__m").isNotNull()
    if tolerance is not None:
        diff = (
            (F.col("__k") - F.col("__m.__rk"))
            if direction == "backward"
            else (F.col("__m.__rk") - F.col("__k"))
        )
        is_ts = dict(left.dtypes)[on].startswith("timestamp")
        if is_ts:
            tol = F.expr(f"INTERVAL {tolerance}")
            valid = valid & (diff <= tol)
        else:
            # numeric key: compare in DOUBLE explicitly — a string
            # literal would lean on ANSI implicit cross-type casting,
            # and casting to an integral key type would truncate a
            # fractional tolerance like '0.5'. float() also validates
            # the literal up front instead of failing mid-job.
            tol = F.lit(float(tolerance))
            valid = valid & (diff.cast("double") <= tol)
    matched = matched.withColumn("__ok", valid)
    if how == "inner":
        matched = matched.filter(F.col("__ok"))

    return matched.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[
            F.when(F.col("__ok"), F.col(f"__m.{c}")).alias(out_names[c])
            for c in payload_cols
        ],
    )
