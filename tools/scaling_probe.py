"""Strong-scaling probe: run a heavy-query subset at a given core count
and print one JSON line. Used to document how the plans scale with
parallelism (PERF.md 'Strong scaling' table).

Usage:
    SPARK_GRAFT_CPUS=4 python tools/scaling_probe.py [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Shuffle/scan-heavy queries whose work actually parallelizes (row-local
#: batteries and 1-row reductions are overhead-bound at sf0.1 and would
#: only measure scheduler latency).
PROBE = [
    "dedup_minhash_lsh",
    "sim_search_lsh",
    "dedup_shared_ngram_spans",
    "q1_pricing_summary",
    "sim_search_topk",
    "dedup_semantic_clustered",
    "winsorized_robust_stats",
    "tfidf_cosine_topk",
]


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")

    from weather_analysis_bigdata__spark.registry import all_queries
    from weather_analysis_bigdata__spark.session import get_spark

    spark = get_spark("scaling-probe")
    registry = all_queries()
    spark.range(1).count()

    times: dict[str, float] = {}
    for name in PROBE:
        per_run = []
        for _ in range(2):
            t0 = time.time()
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            per_run.append(time.time() - t0)
        times[name] = round(min(per_run), 3)
    print(
        json.dumps(
            {
                "cpus": cpus,
                "total_warm": round(sum(times.values()), 3),
                "queries": times,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
