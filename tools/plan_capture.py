"""Capture .explain("formatted") for registered queries into files.

Usage:
    python tools/plan_capture.py --out plans/r11 --suffix _before [--sf DIR] name [...]

Writes <out>/<name><suffix>.txt with the formatted physical plan, the
judge-checkable artifact for optimization claims (guide §1, §7.2).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from weather_analysis_bigdata__spark.registry import all_queries
    from weather_analysis_bigdata__spark.session import get_spark

    spark = get_spark("plan-capture")
    registry = all_queries()
    os.makedirs(args.out, exist_ok=True)
    for name in args.names:
        q = registry[name]
        if q.prepare is not None:
            q.prepare(spark, args.sf)
        df = q.fn(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"PLAN {name} -> {path}", flush=True)


if __name__ == "__main__":
    main()
