"""ARG — emit the row achieving an aggregate optimum (argmax/argmin).

Reference: parser SqlQueryParser.scala:278-298 (`ARG (fnspecs) [OVER MATCH]`),
impl analytics/sequence/matcher/aggregate/SeqArgAggregate.scala. Spark
lowering: max_by/min_by struct trick — a single hash aggregate, no window,
no second pass; partial aggregation runs map-side so it scales.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def arg_opt(
    df: DataFrame,
    opt_expr: Column,
    maximize: bool = True,
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """Return, per partition group (or globally), the full row at which
    ``opt_expr`` attains its max (or min). Ties broken arbitrarily but
    deterministically within a run (same as the reference's first-seen)."""
    row = F.struct(*[F.col(c) for c in df.columns])
    agg = F.max_by(row, opt_expr) if maximize else F.min_by(row, opt_expr)
    if partition_by:
        out = df.groupBy(*partition_by).agg(agg.alias("__row"))
    else:
        out = df.groupBy().agg(agg.alias("__row"))
    return out.select(*[F.col(f"__row.{c}").alias(c) for c in df.columns])
