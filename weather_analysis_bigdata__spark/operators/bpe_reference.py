"""INDEPENDENT pure-Python BPE reference used to build the BPE
queries' literal VALUES oracles — deliberately imports NOTHING from
operators/bpe.py (the implementation under test). The oracles are
registered as CALLABLES (registry.Query.oracle), so the VALUES tables
are regenerated from the CURRENT corpus on first use — a testdata
rebuild between rounds can never leave stale literals behind.
tools/gen_bpe_oracle.py is the CLI wrapper.

All numeric cells are emitted as INTEGER literals; the one double
(compression) is an integer÷integer CAST division so DuckDB performs
the identical single IEEE division Spark does.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

N_MERGES = 10


def _words(text: str) -> list[str]:
    return [w for w in re.split(r"\s+", text.strip().lower()) if w]


def _read_documents(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    return list(
        zip(
            t["doc_id"].to_pylist(),
            t["source"].to_pylist(),
            t["text"].to_pylist(),
        )
    )


def _merge_word(syms: tuple, left: str, right: str) -> tuple:
    out, pending = [], None
    for s in syms:
        if pending == left and s == right:
            out.append(left + right)
            pending = None
        elif pending is None:
            pending = s
        else:
            out.append(pending)
            pending = s
    if pending is not None:
        out.append(pending)
    return tuple(out)


def train_merges(docs) -> list[tuple[int, str, str, int]]:
    """(rank, left, right, pair_freq) — count-desc, pair-asc tie-break
    on the space-joined pair spelling."""
    word_freq: Counter = Counter()
    for _, _, text in docs:
        for w in _words(text):
            word_freq[w] += 1
    states = {w: tuple(w) for w in word_freq}
    merges = []
    for rank in range(1, N_MERGES + 1):
        pairs: Counter = Counter()
        for w, syms in states.items():
            f = word_freq[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (left, right), n = min(
            pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        merges.append((rank, left, right, n))
        states = {w: _merge_word(s, left, right) for w, s in states.items()}
    return merges


def apply_stats(docs, merges) -> dict[str, tuple[int, int, int]]:
    """source -> (n_docs, symbols_before, symbols_after)."""

    def tokenize(word: str) -> int:
        syms: tuple = tuple(word)
        for _, left, right, _ in merges:
            syms = _merge_word(syms, left, right)
        return len(syms)

    out: dict[str, list[int]] = {}
    for _, source, text in docs:
        ws = _words(text)
        before = sum(len(w) for w in ws)
        after = sum(tokenize(w) for w in ws)
        acc = out.setdefault(source, [0, 0, 0])
        acc[0] += 1
        acc[1] += before
        acc[2] += after
    return {s: tuple(v) for s, v in out.items()}


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def train_oracle_sql(sf_dir: str) -> str:
    rows = train_merges(_read_documents(sf_dir))
    vals = ",\n      ".join(
        f"({r}, {_sql_str(l)}, {_sql_str(rt)}, {n})" for r, l, rt, n in rows
    )
    return f"""
    SELECT CAST(merge_rank AS INT) AS merge_rank,
           "left", "right",
           CAST(pair_freq AS BIGINT) AS pair_freq
    FROM (VALUES
      {vals}) AS t(merge_rank, "left", "right", pair_freq)
    ORDER BY merge_rank
    """


def apply_oracle_sql(sf_dir: str) -> str:
    merges = train_merges(_read_documents(sf_dir))
    stats = apply_stats(_read_documents(sf_dir), merges)
    vals = ",\n      ".join(
        f"({_sql_str(s)}, {n}, {b}, {a})"
        for s, (n, b, a) in sorted(stats.items())
    )
    return f"""
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(symbols_before AS BIGINT) AS symbols_before,
           CAST(symbols_after AS BIGINT) AS symbols_after,
           CAST(symbols_after AS DOUBLE) / CAST(symbols_before AS DOUBLE)
             AS compression
    FROM (VALUES
      {vals}) AS t(source, n_docs, symbols_before, symbols_after)
    """


