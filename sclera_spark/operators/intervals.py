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
        joined = df.join(atoms, on=p, how="inner").filter(covers)
    else:
        joined = df.join(broadcast(atoms), on=covers, how="inner")

    # column order parity with the reference: out_lo, out_hi, then input cols
    return joined.select(out_lo, out_hi, *df.columns)
