"""Transform — programmatic per-partition extension operator.

Reference: analytics/transform/expr/Transform.scala:25-148 — an extension
point where a plugin transforms each partition's rows and the result is
either re-joined with the input (Join flavor: original columns + computed
outputs) or appended (Union flavor: output rows unioned with input rows).

Spark lowering: grouped-map pandas (Arrow). The callable receives each
partition's pandas frame and returns a frame matching ``out_schema``.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def transform_partitions(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    out_schema: StructType,
    partition_by: Sequence[str] = (),
) -> DataFrame:
    p = list(partition_by)
    if p:
        return df.groupBy(*p).applyInPandas(lambda _, g: fn(g), out_schema)
    from sclera_spark.scale import warn_unpartitioned

    warn_unpartitioned("Transform")
    # constant grouping column (a bare lit() in groupBy parses as an
    # ordinal in Spark 4.x); dropped before the callable sees the frame
    return (
        df.coalesce(1)
        .withColumn("__sclera_g", F.lit(1))
        .groupBy("__sclera_g")
        .applyInPandas(lambda _, g: fn(g.drop(columns="__sclera_g")), out_schema)
    )
