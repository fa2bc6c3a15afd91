"""Capture .explain("formatted") output for named queries into
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence files.

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
  (no query names = every entry in queries() + bench_extra_queries())
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from sclera_spark.session import build_session

    spark = build_session(app_name="sclera-plan-capture")
    qs = entry.queries()
    qs.update(entry.bench_extra_queries())
    if not names:
        names = list(qs)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"skip unknown query {name}", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            txt = f"PLAN CAPTURE FAILED: {e!r}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"captured {name}")
    spark.stop()


if __name__ == "__main__":
    main()
