"""Full-registry correctness sweep → CORRECTNESS_FULL.json.

Round-8 verdict item 2: the "every query green at every SF" claim must
be a committed machine-readable artifact, not PERF.md prose. This tool
runs EVERY registered query against the DuckDB oracle (the same
compare as tools/check_oracle.py / the driver's gate) at one or more
scale factors and merges the per-query results into
CORRECTNESS_FULL.json at the repo root:

    {
      "registry_size": 382,
      "git_head": "abc123",
      "sfs": {
        "0.01": {"n_ok": .., "n_rows_only": .., "n_fail": ..,
                 "total": .., "wall_sec": ..,
                 "queries": {name: {"status": "OK", "rows": N,
                                    "wall": s}, ...}},
        ...
      }
    }

Usage (the close gate runs all three):
    python tools/full_sweep.py --sf /root/testdata/sf0.001
    python tools/full_sweep.py --sf /root/testdata/sf0.01
    python tools/full_sweep.py --sf /root/testdata/sf0.1

Each invocation rewrites only its own SF section (merge-preserve, the
BENCH_DETAIL idiom), so the three runs can happen in any order and a
re-run after a fix refreshes just the SF it ran at. Exit code 1 if any
query failed at the SF(s) this invocation ran.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from check_oracle import compare, duck_conn  # noqa: E402


def sweep(sf_dir: str) -> dict:
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    from weather_analysis_bigdata__spark.registry import all_queries
    from weather_analysis_bigdata__spark.session import get_spark

    queries = all_queries()
    spark = get_spark("full-sweep")
    con = duck_conn(sf_dir)
    out: dict = {}
    t_all = time.time()
    n_ok = n_rows_only = n_fail = 0
    for name, q in queries.items():
        # Per-query marker on STDERR (where the JVM logs): any runtime
        # WARN in the sweep log now lands under a named query instead
        # of floating unattributable (round-9 verdict item 6 — the
        # 'WindowExec: No Partition Defined' WARNs). Measured round 10
        # (fresh index store, full registry): every such WARN comes
        # from the 13 REVIEWED bounded-reduction global windows
        # (tools/plan_audit.py REVIEWED_FLAGS, each naming its O(k)
        # input); the audit-SKIPPED side-effecting queries emit ZERO.
        print(f"sweep: {name}", file=sys.stderr, flush=True)
        t0 = time.time()
        try:
            spark_pdf = q.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001 - sweep must record, not die
            out[name] = {
                "status": "SPARK_ERROR",
                "err": f"{type(e).__name__}: {str(e)[:300]}",
                "wall": round(time.time() - t0, 3),
            }
            n_fail += 1
            print(f"FAIL  {name}: {out[name]['err']}", flush=True)
            continue
        if q.oracle is None:
            out[name] = {
                "status": "ROWS_ONLY",
                "rows": len(spark_pdf),
                "wall": round(time.time() - t0, 3),
            }
            n_rows_only += 1
            continue
        try:
            duck_pdf = con.execute(q.oracle_text()).df()
        except Exception as e:  # noqa: BLE001
            out[name] = {
                "status": "ORACLE_ERROR",
                "err": f"{type(e).__name__}: {str(e)[:300]}",
                "wall": round(time.time() - t0, 3),
            }
            n_fail += 1
            print(f"FAIL  {name}: {out[name]['err']}", flush=True)
            continue
        res = compare(name, spark_pdf, duck_pdf)
        rec = {
            "status": res["status"],
            "rows": res["rows"],
            "wall": round(time.time() - t0, 3),
        }
        if res["status"] == "OK":
            n_ok += 1
        else:
            n_fail += 1
            rec["detail"] = {
                k: v for k, v in res.items() if k not in ("name", "status")
            }
            print(f"FAIL  {name}: {res}", flush=True)
        out[name] = rec
    spark.stop()
    con.close()
    return {
        "n_ok": n_ok,
        "n_rows_only": n_rows_only,
        "n_fail": n_fail,
        "total": len(queries),
        "wall_sec": round(time.time() - t_all, 1),
        "queries": out,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", action="append", required=True)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CORRECTNESS_FULL.json",
        ),
    )
    args = ap.parse_args()

    artifact: dict = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                artifact = json.load(f)
        except (OSError, json.JSONDecodeError):
            artifact = {}
    artifact.setdefault("sfs", {})

    from weather_analysis_bigdata__spark.registry import all_queries

    registry_size = len(all_queries())
    try:
        git_head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(args.out),
            check=True,
        ).stdout.strip()
    except Exception:  # noqa: BLE001 - the hash is advisory
        git_head = None

    any_fail = False
    for sf_dir in args.sf:
        sf_key = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
        print(f"=== sweep {sf_dir} ===", flush=True)
        section = sweep(sf_dir)
        # Per-SF provenance stamp (round-9 advice): merge-preserve
        # keeps SF sections this invocation didn't run, so without a
        # per-section registry_size/git_head a partially refreshed
        # artifact could silently mix sweeps of different registries —
        # the top-level values only describe the LAST run.
        section["registry_size"] = registry_size
        if git_head is not None:
            section["git_head"] = git_head
        artifact["sfs"][sf_key] = section
        any_fail |= section["n_fail"] > 0
        print(
            f"sf{sf_key}: {section['n_ok']} ok, "
            f"{section['n_rows_only']} rows-only, "
            f"{section['n_fail']} failed, {section['total']} total "
            f"in {section['wall_sec']}s",
            flush=True,
        )

    artifact["registry_size"] = registry_size
    if git_head is not None:
        artifact["git_head"] = git_head
    else:
        artifact.pop("git_head", None)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"wrote {args.out}")
    return 1 if any_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
