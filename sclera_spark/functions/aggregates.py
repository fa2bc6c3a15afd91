"""Sclera aggregate function surface -> native Spark aggregate Columns.

Parity target: the aggregate inventory of the reference
(modules/core/src/main/scala/sql/exec/scalar/ScalFunctionEvaluator.scala:38-50
names; implementations in analytics/sequence/matcher/aggregate/SeqAggregate.scala).

All map to JVM-side Spark aggregates (map-side partial aggregation + final
merge — distributes cleanly, unlike the reference's single-threaded
sort-group iterator, sql/result/TableRowGroupIterator.scala:29). The only
ones needing composition are PATH/STRING_AGG (ordered concat) and the
_POP/_SAMP skew/kurtosis variants (Spark natively exposes only one flavor
of each; the others are derived from central moments).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


from collections.abc import Sequence

# collect_list-backed aggregates materialize ONE array per group in
# executor memory: past this many elements per group the guarded
# expression fails loudly (clear message, before an executor OOM does it
# cryptically). Callers with genuinely huge groups opt out explicitly.
DEFAULT_MAX_GROUP_ELEMENTS = 1_000_000


def _guard_group_size(
    arr: Column, result: Column, limit: int | None, what: str
) -> Column:
    """Fail loudly when a collected per-group array exceeds ``limit``
    elements. assert_true returns NULL on success (so the WHEN takes the
    result branch) and raises a SparkRuntimeException with the message
    otherwise — the guarded expression keeps the result's type."""
    if limit is None:
        return result
    ok = F.assert_true(
        F.size(arr) <= F.lit(limit),
        F.lit(
            f"{what}: group exceeds {limit} elements "
            "(collect_list-backed aggregate materializes one array per "
            "group; raise or disable max_group_elements to override)"
        ),
    )
    return F.when(ok.isNull(), result)


def string_agg(
    col: Column,
    sep: str = ",",
    order_by: Sequence[Column] | None = None,
    max_group_elements: int | None = DEFAULT_MAX_GROUP_ELEMENTS,
) -> Column:
    """STRING_AGG: ordered concatenation. At scale this is a collect_list
    per group — acceptable because groups, not the whole relation, bound
    the state. With ``order_by`` the values are sorted by those key
    expressions (struct-sort: collect (keys..., value) structs, sort_array,
    project the value — the reference's sequence-position ordering,
    SeqAggregate.scala:1201-1365). Keys sort ascending (struct order);
    negate numeric keys for descending. Without ``order_by``, order is
    input order
    (non-deterministic after a shuffle unless the caller sorts first —
    same caveat Spark's own listagg carries)."""
    if order_by is None:
        arr = F.collect_list(col.cast("string"))
        return _guard_group_size(
            arr, F.array_join(arr, sep), max_group_elements, "STRING_AGG"
        )
    s = F.struct(
        *[c.alias(f"__o{i}") for i, c in enumerate(order_by)],
        col.cast("string").alias("__v"),
    )
    arr = F.collect_list(s)
    vals = F.transform(F.sort_array(arr), lambda x: x["__v"])
    return _guard_group_size(
        arr, F.array_join(vals, sep), max_group_elements, "STRING_AGG"
    )


def path(
    col: Column,
    order_by: Sequence[Column] | None = None,
    max_group_elements: int | None = DEFAULT_MAX_GROUP_ELEMENTS,
) -> Column:
    """PATH: Sclera's label-path aggregate — '/'-joined values in order."""
    return string_agg(col, "/", order_by=order_by, max_group_elements=max_group_elements)


def skew_pop(col: Column) -> Column:
    """Population skewness g1 = m3 / m2^1.5 (Spark's `skewness` IS g1)."""
    return F.skewness(col)


def skew_samp(col: Column) -> Column:
    """Sample skewness G1 = g1 * sqrt(n(n-1))/(n-2), derived from g1."""
    n = F.count(col).cast("double")
    g1 = F.skewness(col)
    return g1 * F.sqrt(n * (n - F.lit(1.0))) / (n - F.lit(2.0))


def kurtosis_pop(col: Column) -> Column:
    """Population excess kurtosis g2 = m4/m2^2 - 3 (Spark's `kurtosis` IS g2)."""
    return F.kurtosis(col)


def kurtosis_samp(col: Column) -> Column:
    """Sample excess kurtosis G2 derived from g2."""
    n = F.count(col).cast("double")
    g2 = F.kurtosis(col)
    one = F.lit(1.0)
    return ((n - one) / ((n - F.lit(2.0)) * (n - F.lit(3.0)))) * ((n + one) * g2 + F.lit(6.0))


def nth_value(
    col: Column,
    n,
    max_group_elements: int | None = DEFAULT_MAX_GROUP_ELEMENTS,
) -> Column:
    """NTH_VALUE as an aggregate (1-based): collect_list-backed, with the
    same per-group size guard as STRING_AGG/PATH."""
    arr = F.collect_list(col)
    idx = n - 1 if isinstance(n, int) else n
    return _guard_group_size(arr, F.get(arr, idx), max_group_elements, "NTH_VALUE")


# name -> callable(cols...) -> aggregate Column
AGGREGATE_FUNCTIONS: dict[str, Callable[..., Column]] = {
    "AVG": F.avg,
    "SUM": F.sum,
    "MIN": F.min,
    "MAX": F.max,
    "COUNT": F.count,
    "BOOL_AND": lambda c: F.bool_and(c),
    "BOOL_OR": lambda c: F.bool_or(c),
    "EVERY": lambda c: F.bool_and(c),
    "CORR": F.corr,
    "COVAR_POP": F.covar_pop,
    "COVAR_SAMP": F.covar_samp,
    "STDDEV": F.stddev_samp,
    "STDDEV_POP": F.stddev_pop,
    "STDDEV_SAMP": F.stddev_samp,
    "VAR": F.var_samp,
    "VARIANCE": F.var_samp,
    "VAR_POP": F.var_pop,
    "VAR_SAMP": F.var_samp,
    "SKEW": skew_pop,
    "SKEW_POP": skew_pop,
    "SKEW_SAMP": skew_samp,
    "KURTOSIS": kurtosis_pop,
    "KURTOSIS_POP": kurtosis_pop,
    "KURTOSIS_SAMP": kurtosis_samp,
    "STRING_AGG": string_agg,
    "PATH": path,
    "NTH_VALUE": lambda c, n: nth_value(c, n),
    # linear regression family (reference ScalFunctionEvaluator.scala:38-50)
    "REGR_COUNT": lambda y, x: F.regr_count(y, x),
    "REGR_AVGX": lambda y, x: F.regr_avgx(y, x),
    "REGR_AVGY": lambda y, x: F.regr_avgy(y, x),
    "REGR_INTERCEPT": lambda y, x: F.regr_intercept(y, x),
    "REGR_R2": lambda y, x: F.regr_r2(y, x),
    "REGR_SLOPE": lambda y, x: F.regr_slope(y, x),
    "REGR_SXX": lambda y, x: F.regr_sxx(y, x),
    "REGR_SXY": lambda y, x: F.regr_sxy(y, x),
    "REGR_SYY": lambda y, x: F.regr_syy(y, x),
    # extensions beyond the reference (approximate, scale-friendly)
    "APPROX_COUNT_DISTINCT": F.approx_count_distinct,
    "PERCENTILE_APPROX": lambda c, p: F.percentile_approx(c, p),
}


def aggregate_function(name: str, *args, distinct: bool = False) -> Column:
    """Resolve a Sclera aggregate call. DISTINCT is supported for the
    standard SQL aggregates via count_distinct / sum_distinct etc."""
    key = name.upper()
    if distinct:
        if key == "COUNT":
            return F.count_distinct(*args)
        if key == "SUM":
            return F.sum_distinct(*args)
        if key == "AVG":
            # avg(distinct x) = sum(distinct x)/count(distinct x)
            return F.sum_distinct(*args) / F.count_distinct(*args)
        raise ValueError(f"DISTINCT not supported for aggregate {name}")
    fn = AGGREGATE_FUNCTIONS.get(key)
    if fn is None:
        raise ValueError(f"unknown aggregate function: {name}")
    return fn(*args)
