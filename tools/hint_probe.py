"""Attribute JVM WARN lines (HintErrorLogger / LogicalRDD /
CacheManager) to the registered query that produced them.

Runs every registered query at a small SF, printing a marker line to
the JVM's stderr stream (via System.err) before each query so the
interleaved log can be grepped afterwards:

    python tools/hint_probe.py 2> /tmp/hint_probe.log
    grep -B5 'HintErrorLogger' /tmp/hint_probe.log
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_analysis_bigdata__spark.session import get_spark
from __spark_entry__ import queries


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    only = sys.argv[1:] or None
    spark = get_spark()
    jvm = spark.sparkContext._jvm
    qs = queries()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        jvm.java.lang.System.err.println(f"@@QUERY-BEGIN {name}")
        jvm.java.lang.System.err.flush()
        try:
            df = fn(spark, sf_dir)
            df.count()
        except Exception as exc:  # noqa: BLE001 - probe must keep going
            jvm.java.lang.System.err.println(f"@@QUERY-ERROR {name}: {exc}")
        jvm.java.lang.System.err.println(f"@@QUERY-END {name}")
        jvm.java.lang.System.err.flush()
    spark.stop()


if __name__ == "__main__":
    main()
