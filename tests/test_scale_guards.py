"""Unpartitioned sequential fallbacks must warn (never silently
serialize the input through one task)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sclera_spark.scale import UnpartitionedFallbackWarning


def test_match_warns_without_partition(spark, tables):
    from sclera_spark.operators.match import ColumnRowLabeler, match_rows

    ev = tables["events"].limit(100)
    with pytest.warns(UnpartitionedFallbackWarning, match="MATCH"):
        match_rows(
            ev, "VIEW+ PURCHASE", ColumnRowLabeler("event_type"),
            order_by=["ts", "event_id"],
        )


def test_expmovavg_warns_without_partition(spark, tables):
    from sclera_spark.operators import expmovavg

    ev = tables["events"].select("user_id", "event_id", "ts", "value").limit(100)
    with pytest.warns(UnpartitionedFallbackWarning, match="EXPMOVAVG"):
        expmovavg(
            ev, "value", decay=0.5, partition_by=[], order_by=["ts", "event_id"]
        )


def test_transform_warns_without_partition(spark, tables):
    from sclera_spark.operators import transform_partitions

    ev = tables["events"].select("user_id", "value").limit(10)
    with pytest.warns(UnpartitionedFallbackWarning, match="Transform"):
        transform_partitions(ev, lambda p: p, ev.schema)


def test_partitioned_paths_do_not_warn(spark, tables, recwarn):
    from sclera_spark.operators import expmovavg

    ev = tables["events"].select("user_id", "event_id", "ts", "value").limit(100)
    expmovavg(
        ev, "value", decay=0.5, partition_by=["user_id"], order_by=["ts", "event_id"]
    )
    assert not [
        w for w in recwarn if issubclass(w.category, UnpartitionedFallbackWarning)
    ]


def test_salted_join_matches_plain_join(spark, tables):
    from pyspark.sql import functions as F

    from sclera_spark.scale import salted_join

    # skewed big side: every order keyed to a handful of nations
    big = tables["orders"].select(
        "o_orderkey", (F.col("o_custkey") % 3).cast("int").alias("n_nationkey")
    )
    small = tables["nation"].select("n_nationkey", "n_name")
    salted = salted_join(big, small, "n_nationkey", salt=8)
    plain = big.join(small, "n_nationkey")
    assert salted.count() == plain.count()
    l = salted.groupBy("n_name").count().toPandas().set_index("n_name")["count"]
    r = plain.groupBy("n_name").count().toPandas().set_index("n_name")["count"]
    assert l.sort_index().equals(r.sort_index())

    import pytest as _pytest

    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, "n_nationkey", how="full")


def test_salted_join_spreads_hot_key_across_reducers(spark):
    """The reason salting exists, asserted on the physical distribution:
    a 90%-hot key melts ONE reducer in a shuffled join; after salting,
    the same key's output rows span many shuffle partitions. (Broadcast
    is disabled so the join actually shuffles — the scenario salted_join
    targets is exactly the one where the small side exceeds the
    broadcast threshold.)"""
    from pyspark.sql import functions as F

    from sclera_spark.scale import salted_join

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_coalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # at test scale AQE would coalesce the KB-sized partitions back
    # together, hiding the spread; at 100 TB they exceed the advisory
    # target and stay separate — model that regime
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        big = spark.range(100_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id") % 100)
            .cast("long")
            .alias("k"),
            F.col("id").alias("v"),
        )
        small = spark.createDataFrame(
            [(i, f"d{i}") for i in range(100)], "k long, name string"
        )

        plain_spread = (
            big.join(small, "k")
            .filter("k = 7")
            .select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
        assert plain_spread == 1, "unsalted hot key should hit one reducer"

        salt = 16
        salted_spread = (
            salted_join(big, small, "k", salt=salt)
            .filter("k = 7")
            .select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
        assert salted_spread >= salt // 2, (
            f"hot key spread over only {salted_spread} partitions "
            f"(salt={salt}) — salting is not distributing"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", old_coalesce
        )
