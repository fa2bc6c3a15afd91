"""Z-order (Morton-curve) clustering keys for multi-column data skipping.

``OPTIMIZE t SORT BY (a)`` gives each rewritten file a tight range on
``a`` alone — a probe on ``b`` still opens every file. Interleaving the
bits of EQUI-DEPTH bucket ids of several columns produces a space-
filling-curve key: range-partitioning + sorting on it makes every
output file cover a compact cell of the (a, b, ...) space, so the
manifest's per-file min/max stats (sources/manifest.py) stay tight on
EVERY participating column at once and file-level pruning
(sources/prune.py) works for probes on any of them. This is Delta's
``OPTIMIZE ... ZORDER BY`` in PySpark terms.

Scale shape: one ``approxQuantile`` pass (driver receives at most
``(2**bits - 1) * len(cols)`` doubles — bounded, not data-sized)
derives the bucket boundaries; bucketing and bit-interleaving are pure
JVM column expressions, so the rewrite is a normal repartitionByRange +
sortWithinPartitions job with no Python in the row path. Equi-depth
buckets (quantiles, not min/max ranges) keep the curve balanced under
skew — a hot value collapses into one bucket instead of stretching the
cell grid.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
}


def _as_double(df: DataFrame, col: str) -> Column:
    """Order-preserving numeric view of a column for quantile bucketing
    (the double is only ever compared against boundaries derived from
    the same expression, so precision loss cannot reorder buckets by
    more than a boundary tie)."""
    dt = dict(df.dtypes).get(col)
    if dt is None:
        raise ValueError(f"zorder: no such column: {col}")
    if dt in _NUMERIC or dt.startswith("decimal"):
        return F.col(col).cast("double")
    if dt == "date":
        return F.unix_date(F.col(col)).cast("double")
    if dt.startswith("timestamp"):
        return F.unix_micros(F.col(col).cast("timestamp")).cast("double")
    raise ValueError(
        f"zorder: column {col} has unsupported type {dt} "
        "(numeric/date/timestamp only)"
    )


def zvalue_column(df: DataFrame, cols: Sequence[str], bits: int = 8) -> Column:
    """A long-valued Morton key over ``cols``: per-column equi-depth
    bucket ids (one approxQuantile job) bit-interleaved lowest-bit-
    first. NULLs land in bucket 0 (sorted together; stats-based pruning
    is NULL-safe regardless). ``bits`` per column; len(cols) * bits
    must fit a long."""
    cols = list(cols)
    if not cols:
        raise ValueError("zorder needs at least one column")
    if len(cols) * bits > 62:
        raise ValueError("zorder: len(cols) * bits must be <= 62")
    n = 1 << bits
    probes = [_as_double(df, c) for c in cols]
    tmp = df.select(
        *[e.alias(f"__zq{i}") for i, e in enumerate(probes)]
    )
    qs = [i / n for i in range(1, n)]
    bounds_per_col = tmp.stat.approxQuantile(
        [f"__zq{i}" for i in range(len(cols))], qs, 1.0 / (4 * n)
    )

    z = F.lit(0).cast("long")
    buckets = []
    for e, bounds in zip(probes, bounds_per_col):
        uniq = sorted(set(bounds))
        if not uniq:
            buckets.append(F.lit(0))
            continue
        arr = F.array(*[F.lit(b) for b in uniq])
        # bucket id = number of boundaries <= value (0 when NULL)
        b = F.coalesce(
            F.size(F.filter(arr, lambda x: x <= e)), F.lit(0)
        )
        # rescale collapsed boundary sets onto the full bit width so
        # interleaving stays balanced when a column has few distincts
        if len(uniq) < n - 1:
            b = (b * (n - 1) / len(uniq)).cast("int")
        buckets.append(b)
    for j in range(bits):
        for i, b in enumerate(buckets):
            bit = F.shiftright(b, j).bitwiseAND(F.lit(1)).cast("long")
            z = z.bitwiseOR(F.shiftleft(bit, j * len(cols) + i))
    return z
