"""Sequence aggregates over ordered partitions — Sclera's window tier.

The reference has no SQL OVER(); running/offset analytics are expressed via
its sequence-matcher subsystem applied per PARTITION BY (reference:
analytics/sequence/matcher/aggregate/SeqAggregate.scala:44-1199; wiring in
exec/Normalizer.scala:511-1077). On Spark these lower directly to Window
functions — fully distributed (one shuffle on the partition keys, then
sorted within partitions), versus the reference's single-threaded pass.

EXPMOVAVG (exponential moving average, SeqAggregate.scala `ExpMovAvg`) has
no closed-form Spark window expression; it is implemented with a vectorized
arrow-batched grouped pandas op (applyInPandas) — the documented slow path,
chosen only because the recurrence s_i = d*x_i + (1-d)*s_{i-1} is inherently
sequential per partition. It still distributes across partitions.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def ordered_window(
    partition_by: Sequence[str | Column] = (),
    order_by: Sequence[str | Column] = (),
) -> WindowSpec:
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    return w.orderBy(*order_by)


def running(agg: Column, w: WindowSpec) -> Column:
    """Running aggregate from partition start to current row."""
    return agg.over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))


def movavg(col: Column, n: int, w: WindowSpec) -> Column:
    """MOVAVG(x, n): mean of the last n rows (SeqAggregate.scala MovAvg)."""
    return F.avg(col).over(w.rowsBetween(-(n - 1), Window.currentRow))


def movstddev(col: Column, n: int, w: WindowSpec) -> Column:
    """MOVSTDDEV(x, n): sample stddev of the last n rows."""
    return F.stddev_samp(col).over(w.rowsBetween(-(n - 1), Window.currentRow))


def movsum(col: Column, n: int, w: WindowSpec) -> Column:
    return F.sum(col).over(w.rowsBetween(-(n - 1), Window.currentRow))


def lag(col: Column, offset: int = 1, default=None, w: WindowSpec | None = None) -> Column:
    return F.lag(col, offset, default).over(w)


def nth_value(col: Column, n: int, w: WindowSpec) -> Column:
    return F.nth_value(col, n).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))


def row_number(w: WindowSpec) -> Column:
    return F.row_number().over(w)


def rank(w: WindowSpec) -> Column:
    return F.rank().over(w)


def dense_rank(w: WindowSpec) -> Column:
    return F.dense_rank().over(w)


def expmovavg(
    df: DataFrame,
    value_col: str,
    decay: float,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    out_col: str = "expmovavg",
) -> DataFrame:
    """EXPMOVAVG: s_0 = x_0; s_i = decay*x_i + (1-decay)*s_{i-1} per partition.

    Reference semantics: SeqAggregate.scala (ExpMovAvg). Sequential
    recurrence per partition -> grouped-map pandas (Arrow batches); the
    shuffle key is the partition columns, so this scales with partition
    count, and pandas' ewm kernel is C-vectorized within each group.
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(list(df.schema.fields) + [StructField(out_col, DoubleType())])
    pcols = list(partition_by)
    ocols = list(order_by)

    def _ewm_partition(batches):
        # one Python call per partition; pandas' grouped ewm kernel (cython)
        # handles all groups in the partition at once
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        if pcols:
            pdf[out_col] = (
                pdf.groupby(pcols, sort=False)[value_col]
                .ewm(alpha=decay, adjust=False)
                .mean()
                .reset_index(level=list(range(len(pcols))), drop=True)
            )
        else:
            pdf[out_col] = pdf[value_col].ewm(alpha=decay, adjust=False).mean()
        yield pdf

    if pcols:
        from sclera_spark.scale import keyed_repartition

        arranged = keyed_repartition(df, pcols).sortWithinPartitions(*pcols, *ocols)
    else:
        # single logical sequence: one partition — matches the reference,
        # which is single-threaded anyway
        from sclera_spark.scale import warn_unpartitioned

        warn_unpartitioned("EXPMOVAVG")
        arranged = df.coalesce(1).sortWithinPartitions(*ocols)
    return arranged.mapInPandas(_ewm_partition, out_schema)
