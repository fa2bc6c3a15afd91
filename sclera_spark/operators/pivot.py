"""PIVOT / UNPIVOT reshaping.

Reference: Pivot — analytics/sequence/matcher/expr/Pivot.scala:28 with
parser SqlQueryParser.scala:342-363 (`PIVOT fn(args) FOR col IN (labels)`);
UnPivot — RelOp.scala:766-789 / UnPivotTableResult.scala:30.

Spark lowering: native `groupBy().pivot(col, labels).agg(fn)` (explicit
label list => single pass, no extra distinct-scan job) and native
`DataFrame.unpivot` (stack codegen, no UDF).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame


def pivot(
    df: DataFrame,
    group_by: Sequence[str],
    pivot_col: str,
    labels: Sequence[str],
    agg: Column,
    aliases: dict[str, str] | None = None,
    empty_value=None,
) -> DataFrame:
    """PIVOT agg FOR pivot_col IN (labels [AS alias]) [PARTITION BY group_by].

    ``empty_value``: the aggregate's value over ZERO rows, when that is
    not NULL — Spark's native pivot emits NULL for a label with no rows,
    which is right for SUM/MIN/MAX/AVG but wrong for COUNT (SQL: 0).
    Callers pass 0 for COUNT-family aggregates; found by the
    extended-clause fuzzer (a label filtered out upstream)."""
    from pyspark.sql import functions as F

    out = df.groupBy(*group_by).pivot(pivot_col, list(labels)).agg(agg)
    if empty_value is not None:
        for label in labels:
            out = out.withColumn(
                label, F.coalesce(F.col(f"`{label}`"), F.lit(empty_value))
            )
    if aliases:
        for label, alias in aliases.items():
            out = out.withColumnRenamed(label, alias)
    return out


def unpivot(
    df: DataFrame,
    ids: Sequence[str],
    value_cols: Sequence[str],
    key_col: str,
    value_col: str,
    labels: dict[str, str] | None = None,
) -> DataFrame:
    """UNPIVOT v FOR k IN (c1 AS 'label1', ...): one output row per listed
    column per input row (reference UnPivotTableResult.scala:30)."""
    out = df.unpivot(list(ids), list(value_cols), key_col, value_col)
    if labels:
        from pyspark.sql import functions as F

        mapping = F.create_map(
            *[F.lit(x) for kv in labels.items() for x in kv]
        )
        # unmapped columns keep their own name as the key (reference
        # SqlQueryParser.scala:1043: `vOpt getOrElse CharConst(col.name)`)
        out = out.withColumn(key_col, F.coalesce(mapping[out[key_col]], out[key_col]))
    return out
