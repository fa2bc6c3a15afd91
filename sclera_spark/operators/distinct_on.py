"""DISTINCT ON — first row per key in a given sort order.

Reference: RelOp.scala:445-468 (DistinctOn), exec DistinctTableResult.scala
(first row of each sorted group). Spark lowering: window row_number over
(partition=on_exprs, order=sort_exprs) + filter ==1 — one shuffle on the
key, no driver involvement, AQE handles skewed keys.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__sclera_rn"


def distinct_on(
    df: DataFrame,
    on: Sequence[str | Column],
    order_by: Sequence[Column],
) -> DataFrame:
    w = Window.partitionBy(*on).orderBy(*order_by)
    return df.withColumn(_RN, F.row_number().over(w)).filter(F.col(_RN) == 1).drop(_RN)
