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

Skew: the shuffle is keyed by ``by`` — a hot group funnels to one task;
salt upstream (scale.py salted patterns) or sub-bucket the key range if
a single group dominates at 100 TB.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    direction: str = "backward",
    tolerance: str | None = None,
    how: str = "left",
    suffix: str = "_r",
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
    w = (
        Window.partitionBy(*by)
        .orderBy(key, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )

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
