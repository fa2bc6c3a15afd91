"""TYPEINFER — infer column types by scanning string data.

Reference: `<input> TYPEINFER (cols [NULLS('...')] [LIMIT n])` —
analytics/inferTypes/expr/InferTypes.scala:24-47, executed by
InferTypesTableResult (scan child output, find narrowest SqlType).

Spark lowering: sample up to ``limit`` rows (one bounded job), pick the
narrowest type each candidate parser accepts on every non-null sample
value, then cast the full column lazily — the full-data pass stays in
codegen, only the bounded sample is inspected driver-side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# narrowest-first candidate order (mirrors the reference's preference for
# the most specific SqlType: int < bigint < double < date < timestamp < bool)
_CANDIDATES = ("int", "bigint", "double", "boolean", "date", "timestamp")


def _parses_as(vals: list[str], typ: str) -> bool:
    import datetime

    def try_one(v: str) -> bool:
        try:
            if typ == "int":
                x = int(v)
                return -(2**31) <= x < 2**31
            if typ == "bigint":
                int(v)
                return True
            if typ == "double":
                float(v)
                return True
            if typ == "boolean":
                return v.strip().lower() in ("true", "false", "t", "f", "0", "1")
            if typ == "date":
                datetime.date.fromisoformat(v.strip())
                return True
            if typ == "timestamp":
                datetime.datetime.fromisoformat(v.strip())
                return True
        except (ValueError, OverflowError):
            return False
        return False

    return all(try_one(v) for v in vals)


def infer_types(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    nulls: Sequence[str] = ("",),
    limit: int = 1000,
) -> DataFrame:
    """Infer and apply the narrowest type for each (string) column."""
    cols = list(cols) if cols else [c for c, t in df.dtypes if t == "string"]
    sample = df.select(*cols).limit(limit).collect()
    out = df
    null_set = set(nulls)
    for c in cols:
        vals = [r[c] for r in sample if r[c] is not None and r[c] not in null_set]
        target = None
        if vals:
            for cand in _CANDIDATES:
                if _parses_as(vals, cand):
                    target = cand
                    break
        col = F.col(c)
        if null_set:
            col = F.when(col.isin(list(null_set)), None).otherwise(col)
        out = out.withColumn(c, col.cast(target) if target else col)
    return out
