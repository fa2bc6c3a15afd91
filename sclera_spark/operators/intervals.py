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
  3. output     = df ⋈ atoms on partition keys + containment       (shuffle 2)
The join is an equi-join on the partition keys with a range residual, so
Catalyst uses sort-merge/broadcast-hash on the keys; per-key work is
proportional to the true output size (row × covered-atom pairs). With no
partition columns the atom side is broadcast.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def split_into(
    df: DataFrame,
    lo: str,
    hi: str,
    out_lo: str,
    out_hi: str,
    partition_by: Sequence[str] = (),
) -> DataFrame:
    p = list(partition_by)

    lo_b = df.select(*p, F.col(lo).alias("__b"))
    hi_b = df.select(*p, F.col(hi).alias("__b"))
    bounds = lo_b.union(hi_b).distinct()

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
    covers = (F.col(lo) <= F.col(out_lo)) & (
        F.col(hi).isNull()
        | (F.col(out_hi).isNotNull() & (F.col(out_hi) <= F.col(hi)))
    )
    if p:
        # Linear-size plan: every interval bound IS a boundary, so instead
        # of the join-then-filter (which materializes rows x atoms per key
        # — quadratic on a hot key), look up each interval's start/end
        # boundary INDEX with 1:1 equi-joins, then explode the covered
        # index range. Intermediates stay proportional to input + output
        # at any scale.
        wi = Window.partitionBy(*p).orderBy(F.col(out_lo).asc())
        atoms_idx = (
            atoms.withColumn("__idx", F.row_number().over(wi))
            # atom count per key, for open-ended (hi NULL) intervals; same
            # partitioning as the row_number window -> no extra exchange
            .withColumn("__n", F.max("__idx").over(Window.partitionBy(*p)))
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
    else:
        joined = df.join(broadcast(atoms), on=covers, how="inner")

    # column order parity with the reference: out_lo, out_hi, then input cols
    return joined.select(out_lo, out_hi, *df.columns)
