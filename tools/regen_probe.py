"""Corpus-regeneration robustness probe (round-10 verdict item 4):
prove the 391 registered queries and their planted controls survive a
SEED-SHIFTED regeneration of the testdata, not just the one drop they
were built against.

The driver's generator (seed=42) is not ours to re-run, so the probe
derives a seed-s twin with transformations from the same family as
tools/scale_exponent.py's corpus builder — deterministic, schema- and
structure-preserving, content-changing:

- ``documents``: the corpus VOCABULARY is rotated by a seed-derived
  permutation (token_i → token_{(i+s·7+3) mod |V|}): every byte of
  every text changes, while token-frequency structure, duplicate/
  n-gram EQUALITY structure and whitespace shape are preserved
  exactly — the closest honest emulation of "the generator rolled a
  different vocab". ``n_chars`` is recomputed (token lengths change).
- ``embeddings``: a seed-derived rotation of the 64 coordinates —
  an isometry, so distances, clusters and brute-force top-k are
  preserved exactly while every LSH hyperplane hash, PQ codebook and
  IVF centroid changes.
- ``events``: event-time shifted by s hours (window boundaries all
  move); ids/values/types unchanged.
- ``orders``/``lineitem``: dates shifted by s days (every literal
  date predicate now cuts elsewhere).
- dimension tables: copied verbatim.

The twin lands under /tmp (testdata itself is never touched) with a
distinct basename, so the content-fingerprinted index store
(operators/index_store.py) builds fresh indexes for it automatically.
Then tools/check_oracle.py runs the FULL registry against the twin:
any query overfit to literal corpus bytes (a hard-coded hash, token,
window timestamp or hyperplane bucket) fails loudly; a green sweep is
the robustness certificate CORRECTNESS_FULL's three fixed-SF sweeps
cannot give. Results land in REGEN_PROBE.json.

Usage: python tools/regen_probe.py [--seed 1] [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import shutil
import subprocess
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROOT = "/tmp/spark_graft_regen"

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _rotate_vocab_documents(src: str, dst: str, seed: int) -> int:
    t = pq.read_table(src)
    texts = t["text"].to_pylist()
    vocab = sorted({tok for s in texts for tok in s.split(" ") if tok})
    n = len(vocab)
    k = (seed * 7 + 3) % n or 1
    vmap = {tok: vocab[(i + k) % n] for i, tok in enumerate(vocab)}
    new_texts = [
        " ".join(vmap.get(tok, tok) for tok in s.split(" ")) for s in texts
    ]
    cols = {c: t[c] for c in t.column_names}
    cols["text"] = pa.array(new_texts, type=pa.string())
    cols["n_chars"] = pa.array(
        [len(s) for s in new_texts], type=pa.int64()
    )
    pq.write_table(pa.table(cols), dst)
    return n


def _rotate_dims_embeddings(src: str, dst: str, seed: int) -> None:
    t = pq.read_table(src)
    emb = t["embedding"].to_pylist()
    dim = len(emb[0])
    k = (seed * 11 + 5) % dim or 1
    rolled = [v[k:] + v[:k] for v in emb]
    cols = {c: t[c] for c in t.column_names}
    cols["embedding"] = pa.array(rolled, type=t.schema.field("embedding").type)
    pq.write_table(pa.table(cols), dst)


def _shift_ts(src: str, dst: str, col: str, delta_us: int) -> None:
    t = pq.read_table(src)
    ts = t[col]
    typ = ts.type
    if pa.types.is_timestamp(typ):
        unit = typ.unit
        per_us = {"s": 1 / 1e6, "ms": 1 / 1e3, "us": 1, "ns": 1e3}[unit]
        arr = ts.cast(pa.int64())
        shifted = pc.add(arr, int(delta_us * per_us)).cast(typ)
    else:  # nanos-as-long drops
        shifted = pc.add(ts.cast(pa.int64()), delta_us * 1000)
    cols = {c: (shifted if c == col else t[c]) for c in t.column_names}
    pq.write_table(pa.table(cols), dst)


def build_twin(sf_dir: str, seed: int) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    out = os.path.join(ROOT, f"{base}_regen_s{seed}")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for name in TABLES:
        src = os.path.join(sf_dir, f"{name}.parquet")
        dst = os.path.join(out, f"{name}.parquet")
        if name == "documents":
            nv = _rotate_vocab_documents(src, dst, seed)
            print(f"  documents: vocab rotated ({nv} tokens)", flush=True)
        elif name == "embeddings":
            _rotate_dims_embeddings(src, dst, seed)
            print("  embeddings: coordinate rotation (isometry)", flush=True)
        elif name == "events":
            _shift_ts(src, dst, "ts", seed * 3_600 * 1_000_000)
        elif name == "orders":
            _shift_ts(src, dst, "o_orderdate", seed * 86_400 * 1_000_000)
        elif name == "lineitem":
            _shift_ts(src, dst, "l_shipdate", seed * 86_400 * 1_000_000)
        else:
            shutil.copy(src, dst)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--keep-twin", action="store_true", help="leave the twin on disk"
    )
    args = ap.parse_args()

    print(f"building seed-{args.seed} twin of {args.sf}", flush=True)
    twin = build_twin(args.sf, args.seed)
    print(f"twin at {twin}; running full oracle check", flush=True)

    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(HERE, "tools", "check_oracle.py"),
            "--sf",
            twin,
        ],
        capture_output=True,
        text=True,
    )
    sys.stdout.write(proc.stdout[-4000:])
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
        "seed": args.seed,
        "base_sf": args.sf,
        "twin": twin,
        "transform": "vocab rotation / embedding-dim rotation / "
        "event +{s}h / order dates +{s}d".format(s=args.seed),
        "ok": ok,
        "failed": fail,
        "failed_names": failed_names,
        "exit_code": proc.returncode,
        "git_head": head,
        "recorded_at": datetime.datetime.now(
            datetime.timezone.utc
        ).strftime("%Y-%m-%dT%H:%M:%SZ"),
    }
    # Append-style artifact: one record per (seed, sf) probe, newest
    # last — a second seed must not erase the first seed's evidence.
    path = os.path.join(HERE, "REGEN_PROBE.json")
    records = []
    if os.path.exists(path):
        try:
            with open(path) as f:
                prev = json.load(f)
            records = prev if isinstance(prev, list) else [prev]
        except (OSError, json.JSONDecodeError):
            records = []
    records = [
        r
        for r in records
        if not (r.get("seed") == args.seed and r.get("base_sf") == args.sf)
    ] + [record]
    with open(path, "w") as f:
        json.dump(records, f, indent=1)
    print(json.dumps({k: record[k] for k in ("seed", "ok", "failed")}))
    if not args.keep_twin and proc.returncode == 0:
        shutil.rmtree(twin, ignore_errors=True)
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
