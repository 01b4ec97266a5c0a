"""Full-registry oracle sweep under the RELIABLE pin posture
(round-10 verdict item: SPARK_GRAFT_PIN_MODE=reliable was the
documented cluster-fault-tolerance answer but was proven on one
query). Runs tools/check_oracle.py in a subprocess with the env flag
set, so every pin site in every query executes the reliable path
(persist DISK_ONLY for one-shot pins, reliable checkpoint() for
iterative supersteps — see session.pin / session.pin_iter), and
records the verdict plus wall-time delta in CORRECTNESS_RELIABLE.json.

Usage: python tools/reliable_sweep.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    env = dict(os.environ, SPARK_GRAFT_PIN_MODE="reliable")
    t0 = time.time()
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(HERE, "tools", "check_oracle.py"),
            "--sf",
            args.sf,
        ],
        capture_output=True,
        text=True,
        env=env,
    )
    wall = round(time.time() - t0, 1)
    sys.stdout.write(proc.stdout[-3000:])
    ok = fail = 0
    failed_names = []
    for ln in proc.stdout.splitlines():
        if ln.startswith("ok"):
            ok += 1
        elif ln.startswith("FAIL"):
            fail += 1
            failed_names.append(ln.split()[1].rstrip(":"))
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True,
        text=True,
        cwd=HERE,
    ).stdout.strip()
    record = {
        "pin_mode": "reliable",
        "sf": args.sf,
        "ok": ok,
        "failed": fail,
        "failed_names": failed_names,
        "wall_sec": wall,
        "exit_code": proc.returncode,
        "git_head": head,
        "recorded_at": datetime.datetime.now(
            datetime.timezone.utc
        ).strftime("%Y-%m-%dT%H:%M:%SZ"),
        "note": "same registry and oracles as CORRECTNESS_FULL; only "
        "the pin posture differs (persist DISK_ONLY / reliable "
        "checkpoint instead of localCheckpoint)",
    }
    with open(os.path.join(HERE, "CORRECTNESS_RELIABLE.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(
        json.dumps({k: record[k] for k in ("pin_mode", "ok", "failed", "wall_sec")})
    )
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
