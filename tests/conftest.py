from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sclera_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SCLERA_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="sclera-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tables(spark):
    from sclera_spark.catalog import load_tables

    return load_tables(spark, SF_DIR)


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    return con


def assert_df_equal_duck(sdf, duck_con, sql, float_tol=1e-9):
    """Compare a Spark DataFrame against a DuckDB query, order-insensitive,
    column-name keyed (mirrors the driver's t2 protocol)."""
    import math

    import pandas as pd

    left = sdf.toPandas()
    right = duck_con.execute(sql).fetchdf()
    assert sorted(left.columns) == sorted(right.columns), (
        f"columns differ: {sorted(left.columns)} vs {sorted(right.columns)}"
    )
    cols = sorted(left.columns)
    left = left[cols]
    right = right[cols]
    assert len(left) == len(right), f"row counts differ: {len(left)} vs {len(right)}"

    def canon(df: pd.DataFrame):
        rows = []
        for tup in df.itertuples(index=False):
            row = []
            for v in tup:
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    row.append("<NULL>")
                elif isinstance(v, float):
                    row.append(f"{v:.9g}")
                elif hasattr(v, "isoformat"):
                    row.append(v.isoformat())
                else:
                    row.append(str(v))
            rows.append(tuple(row))
        return sorted(rows)

    lc, rc = canon(left), canon(right)
    for i, (a, b) in enumerate(zip(lc, rc)):
        assert a == b, f"row {i} differs:\n  spark={a}\n  duck ={b}"
