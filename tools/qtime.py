"""Time individual registered queries in a fresh session.

Methodology mirrors bench.py (guide §1.4): prepare() runs untimed, the
timed action is the noop sink (computes every column of every row,
writes nothing), each query runs N times and all runs print so warm
(min) and cold (first) are both visible.

Usage:
    python tools/qtime.py [--sf DIR] [--n 3] name [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from weather_analysis_bigdata__spark.registry import all_queries
    from weather_analysis_bigdata__spark.session import get_spark

    spark = get_spark("qtime")
    registry = all_queries()
    # Same dedicated warmup scan-agg as bench.py.
    (
        spark.read.parquet(os.path.join(args.sf, "events.parquet"))
        .groupBy("event_type")
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    for name in args.names:
        q = registry[name]
        if q.prepare is not None:
            q.prepare(spark, args.sf)
        runs = []
        for _ in range(args.n):
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.time()
            df = q.fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"QTIME {name} warm={min(runs):.3f} cold={runs[0]:.3f} "
            f"runs={[round(r, 3) for r in runs]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
