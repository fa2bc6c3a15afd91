"""Per-group size guard on collect_list-backed aggregates
(functions/aggregates.py): STRING_AGG/PATH/NTH_VALUE materialize one
array per group, so past max_group_elements the expression must fail
loudly with a clear message instead of letting an executor OOM explain
it. Guard disabled -> old behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sclera_spark.functions.aggregates import nth_value, path, string_agg


@pytest.fixture()
def groups(spark):
    return spark.range(10).select(
        (F.col("id") % 2).alias("g"), F.col("id").cast("string").alias("v")
    )


def test_string_agg_within_limit_ok(groups):
    rows = (
        groups.groupBy("g")
        .agg(string_agg(F.col("v"), ",", order_by=[F.col("v")]).alias("s"))
        .collect()
    )
    assert sorted(r.s for r in rows) == ["0,2,4,6,8", "1,3,5,7,9"]


def test_string_agg_guard_fires_past_limit(groups):
    df = groups.groupBy("g").agg(
        string_agg(F.col("v"), ",", max_group_elements=3).alias("s")
    )
    with pytest.raises(Exception, match="group exceeds 3 elements"):
        df.collect()


def test_path_and_nth_value_guard(groups):
    with pytest.raises(Exception, match="group exceeds 2 elements"):
        groups.groupBy("g").agg(
            path(F.col("v"), max_group_elements=2).alias("p")
        ).collect()
    with pytest.raises(Exception, match="NTH_VALUE: group exceeds 2"):
        groups.groupBy("g").agg(
            nth_value(F.col("v"), 1, max_group_elements=2).alias("n")
        ).collect()


def test_guard_opt_out(groups):
    rows = (
        groups.groupBy("g")
        .agg(
            string_agg(
                F.col("v"), ",", order_by=[F.col("v")], max_group_elements=None
            ).alias("s")
        )
        .collect()
    )
    assert len(rows) == 2
