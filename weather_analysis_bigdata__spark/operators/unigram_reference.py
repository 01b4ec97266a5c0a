"""INDEPENDENT pure-Python unigram-LM reference used to build the
unigram queries' literal VALUES oracles and the exact-equality test
gate. Deliberately re-implements the ALGORITHM (seeding, Viterbi,
EM prune) from scratch with plain dict/loop code — the only imports
from operators/unigram.py are the configuration constants and
:func:`~weather_analysis_bigdata__spark.operators.unigram.piece_cost`,
the shared one-line quantizer (the _nb_lp_generic precedent: the
single non-integer op runs once, in CPython, identically on both
paths; everything algorithmic is written twice).

Oracles are registered as CALLABLES, so the VALUES tables regenerate
from the CURRENT corpus on first use — a testdata rebuild between
rounds can never leave stale literals behind (the BPE-oracle pattern,
operators/bpe_reference.py).
"""

from __future__ import annotations

import os
import re
from collections import Counter

from weather_analysis_bigdata__spark.operators.unigram import (
    EM_ITERS,
    MAX_PIECE,
    MIN_COUNT,
    SEED,
    VOCAB_TARGET,
    piece_cost,
)

_INF = 1 << 40


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


def _word_freqs(docs) -> Counter:
    wf: Counter = Counter()
    for _, _, text in docs:
        for w in _words(text):
            wf[w] += 1
    return wf


def _seed_counts(wf: Counter) -> tuple[dict, dict]:
    """charset counts + top-SEED multi-char substring counts, weighted
    by word frequency, substring lengths 1..MAX_PIECE."""
    sub: Counter = Counter()
    for w, f in wf.items():
        n = len(w)
        for i in range(n):
            for l in range(1, min(MAX_PIECE, n - i) + 1):
                sub[w[i : i + l]] += f
    chars = {p: c for p, c in sub.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in sub.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:SEED]
    return chars, dict(multi)


def _prune(chars: dict, multi: dict) -> dict:
    kept = sorted(
        ((p, c) for p, c in multi.items() if c >= MIN_COUNT),
        key=lambda kv: (-kv[1], kv[0]),
    )[:VOCAB_TARGET]
    out = dict(chars)
    out.update(kept)
    return out


def _costed(counts: dict) -> dict[str, tuple[int, int]]:
    """piece -> (count, cost) with the shared quantizer."""
    total = sum(counts.values())
    v = len(counts)
    return {p: (c, piece_cost(c, total, v)) for p, c in counts.items()}


def _viterbi(word: str, cost: dict[str, int]) -> list[str]:
    """Min-integer-cost segmentation; ties prefer the LONGER piece
    (the (cost, -len) argmin of the Spark fold)."""
    n = len(word)
    dp = [0] + [_INF] * n
    bp = [0] * (n + 1)
    for i in range(1, n + 1):
        best = (_INF, 0)  # (cost, -len)
        for l in range(1, min(MAX_PIECE, i) + 1):
            piece = word[i - l : i]
            c = cost.get(piece)
            if c is None or dp[i - l] >= _INF:
                continue
            cand = (dp[i - l] + c, -l)
            if cand < best:
                best = cand
        dp[i], bp[i] = best[0], -best[1]
    out: list[str] = []
    pos = n
    while pos > 0:
        l = bp[pos]
        out.append(word[pos - l : pos])
        pos -= l
    return out[::-1]


def train(docs) -> list[tuple[str, int, int]]:
    """Final vocabulary [(piece, count, cost)] sorted by piece."""
    wf = _word_freqs(docs)
    char_seed, multi_seed = _seed_counts(wf)
    vocab = _costed(_prune(char_seed, multi_seed))
    for _ in range(EM_ITERS):
        cost = {p: cc[1] for p, cc in vocab.items()}
        used: Counter = Counter()
        for w, f in wf.items():
            for piece in _viterbi(w, cost):
                used[piece] += f
        chars = {p: used.get(p, 0) for p in char_seed}
        multi = {p: c for p, c in used.items() if len(p) > 1}
        vocab = _costed(_prune(chars, multi))
    return sorted((p, c, q) for p, (c, q) in vocab.items())


def apply_stats(docs, vocab) -> dict[str, tuple[int, int, int]]:
    """source -> (n_docs, chars_total, unigram_tokens) under the
    trained vocabulary's Viterbi tokenization."""
    cost = {p: q for p, _, q in vocab}
    cache: dict[str, int] = {}
    out: dict[str, list[int]] = {}
    for _, source, text in docs:
        ws = _words(text)
        before = sum(len(w) for w in ws)
        after = 0
        for w in ws:
            if w not in cache:
                cache[w] = len(_viterbi(w, cost))
            after += cache[w]
        acc = out.setdefault(source, [0, 0, 0])
        acc[0] += 1
        acc[1] += before
        acc[2] += after
    return {s: tuple(v) for s, v in out.items()}


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def train_oracle_sql(sf_dir: str) -> str:
    """Top-64 multi-char pieces by (count DESC, piece ASC) as a literal
    VALUES table — the registered train query's bounded output."""
    vocab = train(_read_documents(sf_dir))
    top = sorted(
        ((p, c, q) for p, c, q in vocab if len(p) > 1),
        key=lambda r: (-r[1], r[0]),
    )[:64]
    vals = ",\n      ".join(
        f"({i + 1}, {_sql_str(p)}, {len(p)}, {c}, {q})"
        for i, (p, c, q) in enumerate(top)
    )
    return f"""
    SELECT CAST(piece_rank AS INT) AS piece_rank, piece,
           CAST(piece_len AS INT) AS piece_len,
           CAST(use_count AS BIGINT) AS use_count,
           CAST(cost_micronat AS BIGINT) AS cost_micronat
    FROM (VALUES
      {vals}) AS t(piece_rank, piece, piece_len, use_count, cost_micronat)
    ORDER BY piece_rank
    """


def apply_oracle_sql(sf_dir: str) -> str:
    docs = _read_documents(sf_dir)
    vocab = train(docs)
    stats = apply_stats(docs, vocab)
    vals = ",\n      ".join(
        f"({_sql_str(s)}, {n}, {b}, {a})"
        for s, (n, b, a) in sorted(stats.items())
    )
    return f"""
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(chars_total AS BIGINT) AS chars_total,
           CAST(unigram_tokens AS BIGINT) AS unigram_tokens,
           CAST(unigram_tokens AS DOUBLE) / CAST(chars_total AS DOUBLE)
             AS compression
    FROM (VALUES
      {vals}) AS t(source, n_docs, chars_total, unigram_tokens)
    """
