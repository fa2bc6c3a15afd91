"""Simulate the driver's t2 gate locally: run every queries() entry and its
oracle_sql() on the same sf dir, compare row-count + columns + canonical
values. Usage: python tools/check_entry.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")


def canon_value(v):
    # full-precision repr: the driver's hash is stricter than %.9g (round-1
    # scalar_math passed locally at 9 digits but failed the driver on
    # BIGINT-vs-DOUBLE and ulp drift), so the local gate must not round
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NULL>"
        return repr(float(v))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def canon_rows(pdf):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    return sorted(tuple(canon_value(v) for v in row) for row in pdf.itertuples(index=False))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry

    # vanilla session, mirroring the grading driver (NOT build_session):
    # entries must set any conf they need through ScleraEngine themselves
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("check-entry")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            left = sdf.toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: engine error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(left)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            right = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle error {e}")
            continue
        if sorted(left.columns) != sorted(right.columns):
            failures.append(name)
            print(
                f"FAIL {name}: columns {sorted(left.columns)} vs {sorted(right.columns)}"
            )
            continue
        if len(left) != len(right):
            failures.append(name)
            print(f"FAIL {name}: rowcount {len(left)} vs {len(right)}")
            continue
        lc, rc = canon_rows(left), canon_rows(right)
        if lc != rc:
            failures.append(name)
            bad = next(i for i, (a, b) in enumerate(zip(lc, rc)) if a != b)
            print(f"FAIL {name}: values differ at sorted row {bad}:")
            print(f"  spark={lc[bad]}")
            print(f"  duck ={rc[bad]}")
            continue
        print(f"ok   {name}: {len(left)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
