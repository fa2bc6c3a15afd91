"""SPLIT (lo, hi) INTO (out_lo, out_hi) [PARTITION BY ...] — disjoint intervals.

Breaks possibly-overlapping input intervals into disjoint atomic intervals,
replicating each input row onto every atom its interval covers.

Reference semantics (modules/core/src/main/scala/sql/exec/relational/
DisjointIntervalTableResult.scala:38-236): a sweep-line "histogram" refines
the interval set at every boundary; each atom emits one output row per
covering input interval; intervals must satisfy lo < hi; a NULL bound sorts
last, i.e. NULL hi == +infinity.

Spark lowering — set-based, no UDF, fully parallel (unlike the reference's
single-threaded sweep):
  1. boundaries = distinct(lo) ∪ distinct(hi) per partition        (shuffle 1)
  2. atoms      = consecutive boundary pairs via lead() window     (same shuffle)
  3. output     = boundary-INDEX lookups (1:1 equi-joins) + range explode
Each interval's bounds resolve to boundary indices and the covered index
range explodes per row, so intermediates stay O(input + output) at any key
distribution — no quadratic join-then-filter, no broadcast-nested-loop.
With no partition columns only the boundary table's numbering runs
single-task (the distinct-bounds set — what the reference's whole sweep
touches single-threaded); index joins and the explode stay parallel.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def split_into(
    df: DataFrame,
    lo: str,
    hi: str,
    out_lo: str,
    out_hi: str,
    partition_by: Sequence[str] = (),
) -> DataFrame:
    p = list(partition_by)

    # one input scan for both bound columns (explode keeps NULL elements,
    # so this is exactly union(lo-proj, hi-proj)); the old two-projection
    # union read the source twice
    bounds = df.select(
        *p, F.explode(F.array(F.col(lo), F.col(hi))).alias("__b")
    ).distinct()

    w = (Window.partitionBy(*p) if p else Window.partitionBy()).orderBy(
        F.col("__b").asc_nulls_last()
    )
    atoms = (
        bounds.withColumn("__b_next", F.lead("__b").over(w))
        # atom start is always a finite boundary (inputs require lo < hi);
        # drop the degenerate pair starting at the NULL(+inf) boundary
        .filter(F.col("__b").isNotNull())
        .select(
            *p,
            F.col("__b").alias(out_lo),
            F.col("__b_next").alias(out_hi),
        )
    )

    # containment: row interval [lo, hi) covers atom [out_lo, out_hi)
    # Linear-size plan: every interval bound IS a boundary, so instead
    # of the join-then-filter (which materializes rows x atoms per key
    # — quadratic on a hot key, and a BroadcastNestedLoopJoin in the
    # unpartitioned case, which breaks outright at scale: broadcast
    # limits + O(rows x atoms) work), look up each interval's start/end
    # boundary INDEX with 1:1 equi-joins, then explode the covered
    # index range. Intermediates stay proportional to input + output at
    # any scale. With no partition columns only the BOUNDARY table's
    # row_number runs single-task (distinct bounds — the same set the
    # reference's single-threaded sweep touches); the index joins and
    # the explode remain fully parallel shuffle operations.
    if not p:
        from sclera_spark.scale import warn_unpartitioned

        warn_unpartitioned("split_into", hint="pass partition_by=[...]")
    wi = Window.partitionBy(*p).orderBy(F.col(out_lo).asc())
    atoms_idx = (
        atoms.withColumn("__idx", F.row_number().over(wi))
        # atom count per key, for open-ended (hi NULL) intervals; same
        # partitioning as the row_number window -> no extra exchange
        .withColumn("__n", F.max("__idx").over(Window.partitionBy(*p)))
        # materialize ONCE: atoms_idx feeds three consumers (lo_idx,
        # hi_idx, the final atom-bounds join); without the checkpoint
        # Spark re-executes the whole distinct+window subtree — and
        # re-reads the input — per consumer (measured plan: 18
        # Exchanges, the atoms pipeline appearing three times). The
        # checkpointed frame is the distinct-bounds set: small relative
        # to the input, local-disk backed, freed by the ContextCleaner.
        .localCheckpoint(eager=True)
    )
    lo_idx = atoms_idx.select(
        *p, F.col(out_lo).alias("__lov"), F.col("__idx").alias("__ilo"), "__n"
    )
    hi_idx = atoms_idx.select(
        *p, F.col(out_lo).alias("__hiv"), F.col("__idx").alias("__ihi")
    )
    src = df.withColumn("__lov", F.col(lo)).withColumn("__hiv", F.col(hi))
    spans = (
        src.join(lo_idx, on=p + ["__lov"], how="inner")  # NULL lo -> no rows
        .join(hi_idx, on=p + ["__hiv"], how="left")      # NULL hi -> __ihi NULL
        .withColumn(
            "__end",
            F.when(F.col(hi).isNull(), F.col("__n")).otherwise(
                F.col("__ihi") - 1
            ),
        )
        .filter(F.col("__end") >= F.col("__ilo"))
    )
    exploded = spans.withColumn(
        "__idx", F.explode(F.sequence(F.col("__ilo"), F.col("__end")))
    )
    joined = exploded.join(
        atoms_idx.select(*p, "__idx", out_lo, out_hi), on=p + ["__idx"]
    )

    # column order parity with the reference: out_lo, out_hi, then input cols
    return joined.select(out_lo, out_hi, *df.columns)
