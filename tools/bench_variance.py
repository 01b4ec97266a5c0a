"""Bench variance bands: runs bench.py N times (solo — run this with
nothing else on the machine), collects each run's per-query warm
times, and records {query: {runs, min, max, spread}} under
``variance_3runs`` in BENCH_DETAIL.json (merge-preserving every other
key). This is the contention-adjudication record the round-2 verdict
asked for, covering the FULL headline.

Bands are MULTI-SESSION (round 11): new runs MERGE into the existing
per-query history (last ``_MAX_HISTORY`` runs kept) instead of
replacing it. Measured why: this host's noise regime is bimodal on
~hour scales — three same-commit bench runs after a single-session
3-run band produced three DISJOINT marginal flag sets
(pack_sequences_bestfit 0.87 vs [0.49..0.59], then
ann_filtered_prefilter_topk 1.11 vs [0.76..0.79] +
dedup_minhash_bucket_capped 1.82 vs [1.37..1.47]), each
fresh-subprocess-"confirmed" because host weather outlives any
session. A band recorded in one quiet 25-minute window cannot gate
measurements taken an hour later; a band whose history spans regimes
can. The masking trade is bounded: a genuine regression must exceed
the HISTORICAL max + noise, so only speedups-then-regressions inside
the history window hide — and the history ages out in
``_MAX_HISTORY`` runs.

Usage: python tools/bench_variance.py [n_runs]
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL = os.path.join(HERE, "BENCH_DETAIL.json")

#: Per-query run history cap across invocations (multi-session bands).
_MAX_HISTORY = 9


def _merge_history(new: dict, prev_section: dict, sf) -> dict:
    """Fold the previous section's per-query run history into ``new``
    (keeping the last ``_MAX_HISTORY`` runs per query). SF-mismatched
    history is discarded — scale factors never mix in one band."""
    if not prev_section or prev_section.get("sf") != sf:
        return new
    prev = prev_section.get("queries") or {}
    for q, b in new.items():
        p = prev.get(q)
        if p and p.get("runs"):
            hist = (list(p["runs"]) + list(b["runs"]))[-_MAX_HISTORY:]
            new[q] = {
                "runs": hist,
                "min": min(hist),
                "max": max(hist),
                "spread": round(max(hist) - min(hist), 3),
            }
    return new


def _band(runs: list[dict[str, float]]) -> dict:
    names = sorted(set().union(*[set(r) for r in runs]))
    var = {}
    for q in names:
        vals = [r[q] for r in runs if q in r and r[q] is not None]
        if not vals:
            continue
        var[q] = {
            "runs": vals,
            "min": min(vals),
            "max": max(vals),
            "spread": round(max(vals) - min(vals), 3),
        }
    return var


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    runs: list[dict[str, float]] = []
    srunns: list[dict[str, float]] = []
    for i in range(n_runs):
        subprocess.run(
            [sys.executable, os.path.join(HERE, "bench.py")],
            check=True,
            cwd=HERE,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        with open(DETAIL) as f:
            d = json.load(f)
        runs.append(d["queries"])
        # Streaming rate band (round-9 verdict item 5): each run's
        # rows/s per replay, so bench.py can adjudicate ingest-rate
        # regressions the way it adjudicates warm wall times.
        srunns.append(
            {
                n: rec.get("rows_per_sec")
                for n, rec in (d.get("streaming_throughput") or {}).items()
            }
        )
        print(f"run {i + 1}/{n_runs}: total "
              f"{round(sum(runs[-1].values()), 2)} s", flush=True)

    with open(DETAIL) as f:
        detail = json.load(f)
    var = _merge_history(
        _band(runs), detail.get("variance_3runs") or {}, detail.get("sf")
    )
    svar = (
        _merge_history(
            _band(srunns),
            detail.get("streaming_variance_3runs") or {},
            detail.get("sf"),
        )
        if any(srunns)
        else {}
    )
    # Band provenance (round-10 verdict item 6): bench.py copies these
    # into the regressions blocks so a reader of BENCH_r{N}.json can
    # see which commit/date the gating bands describe.
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True,
        text=True,
        cwd=HERE,
    ).stdout.strip() or None
    recorded_at = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )
    detail["variance_3runs"] = {
        "n_runs": n_runs,
        # sf stamp: the bench runs above used bench.py's default SF
        # (or $SPARK_GRAFT_SF_DIR) — record it so a later bench at a
        # different --sf can't silently mix scale factors (advice r5)
        "sf": detail.get("sf"),
        "git_head": head,
        "recorded_at": recorded_at,
        "queries": var,
        "max_spread": max(v["spread"] for v in var.values()),
        "note": "solo runs (no concurrent load); per-query warm times; "
        f"multi-session history (last <= {_MAX_HISTORY} runs merged "
        "across invocations)",
    }
    detail["streaming_variance_3runs"] = {
        "n_runs": n_runs,
        "sf": detail.get("sf"),
        "git_head": head,
        "recorded_at": recorded_at,
        "queries": svar,
        "note": "solo runs; per-replay ingest rates (rows/s); "
        f"multi-session history (last <= {_MAX_HISTORY} runs)",
    }
    with open(DETAIL, "w") as f:
        json.dump(detail, f, indent=1)
    worst = sorted(var.items(), key=lambda kv: -kv[1]["spread"])[:5]
    print("worst spreads:", {k: v["spread"] for k, v in worst})


if __name__ == "__main__":
    main()
