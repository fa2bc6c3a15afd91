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

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    bin_width: int = 3600,
    closed: bool = True,
) -> DataFrame:
    """Pairs of (left, right) rows whose intervals overlap:
    ``l_start <= r_end AND r_start <= l_end`` (``closed=False`` makes
    both comparisons strict — half-open intervals that merely touch do
    not match). Bounds must be numeric (cast timestamps with
    ``unix_micros``/``epoch`` first — one expression, keeps binning
    integral). Output columns: ``by`` keys once, then both sides'
    payloads (right columns colliding with left names get ``_r``)."""
    ls, le = left_bounds
    rs, re_ = right_bounds
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
    bin_width: int = 3600,
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
