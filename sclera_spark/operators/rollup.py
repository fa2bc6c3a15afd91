"""Hypertable-style multi-resolution time rollup (continuous-aggregate
cascade): aggregate raw rows once at the finest bucket, then derive each
coarser level by RE-aggregating the previous level — never re-scanning
raw data.

No reference counterpart (the reference has plain GROUP BY); extension
tier. The cascade is the part that matters at 100 TB: the raw scan
happens exactly once, and every coarser level reads an input that is
already reduced by the finer bucket's cardinality (a day level reads 24
rows per key-hour, not 86 M raw events). Only decomposable aggregates
can ride the cascade — count re-aggregates as sum, sum/min/max as
themselves; averages are derived at read time as sum/count.

Bucket alignment: Spark's ``window()`` aligns buckets to the epoch, so
levels must nest — each coarser duration an integer multiple of the
finer — or coarse buckets would slice fine buckets apart. Validated
eagerly; a misaligned cascade is a silent-wrong-answer bug otherwise.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNIT_S = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}

_FIRST = {"sum": F.sum, "min": F.min, "max": F.max}
_REAGG = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def _duration_s(s: str) -> int:
    n, unit = s.strip().split()
    return int(n) * _UNIT_S[unit.lower()]


def time_rollup(
    df: DataFrame,
    ts_col: str,
    aggs: dict[str, tuple[str, str | None]],
    levels: Sequence[str],
    keys: Sequence[str] = (),
) -> dict[str, DataFrame]:
    """Cascaded time-bucket aggregates at every level, finest first.

    ``aggs``: name -> (kind, col) with kind in {count, sum, min, max}
    (col ignored for count). ``levels``: window durations, finest first,
    each dividing the next. Returns {level: DataFrame} with columns
    (bucket_start, bucket_end, *keys, *agg names); each level is
    computed FROM the previous one."""
    secs = [_duration_s(lv) for lv in levels]
    for a, b in zip(secs, secs[1:]):
        if b % a != 0:
            raise ValueError(
                f"levels must nest: {b}s is not a multiple of {a}s"
            )
    for name, (kind, _col) in aggs.items():
        if kind not in _REAGG:
            raise ValueError(
                f"{name}: {kind!r} is not cascade-decomposable "
                "(supported: count, sum, min, max; derive avg as sum/count)"
            )

    out: dict[str, DataFrame] = {}
    cur: DataFrame | None = None
    for i, lv in enumerate(levels):
        if cur is None:
            g = df.groupBy(
                F.window(F.col(ts_col), lv).alias("__w"), *[F.col(k) for k in keys]
            )
            exprs = [
                F.count(F.lit(1)).alias(n)
                if kind == "count"
                else _FIRST[kind](col).alias(n)
                for n, (kind, col) in aggs.items()
            ]
        else:
            g = cur.groupBy(
                F.window(F.col("bucket_start"), lv).alias("__w"),
                *[F.col(k) for k in keys],
            )
            exprs = [
                _REAGG[kind](n).alias(n) for n, (kind, _col) in aggs.items()
            ]
        cur = g.agg(*exprs).select(
            F.col("__w.start").alias("bucket_start"),
            F.col("__w.end").alias("bucket_end"),
            *keys,
            *aggs.keys(),
        )
        out[lv] = cur
    return out
