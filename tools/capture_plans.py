#!/usr/bin/env python
"""Capture .explain('formatted') for queries into plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/capture_plans.py <tag> <suffix> [q1,q2,...]
Defaults to every bench HEADLINE query. Plans are captured from the
UNEXECUTED DataFrame (initial AQE plan), which is what the optimization
round's before/after evidence compares: Exchange count, join strategy,
PushedFilters/ReadSchema, Python eval nodes.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

from scylla_cdc_java_spark.queries import QUERIES  # noqa: E402
from scylla_cdc_java_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    if len(sys.argv) > 3:
        names = [q for q in sys.argv[3].split(",") if q]
    else:
        sys.path.insert(0, REPO)
        import bench

        names = bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    for name in names:
        fn, _, _ = QUERIES[name]
        spark.catalog.clearCache()
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
