"""Byte-pair-encoding merge training over a document corpus.

The tokenizer-training step of an LLM data pipeline (Sennrich et al.
2016; the GPT-2 tokenizer trains this way over bytes): starting from
characters, repeatedly find the most frequent adjacent symbol pair
(weighted by word frequency) and merge it into a new symbol. The merge
LIST is the trained artifact — applying it in order reproduces the
tokenizer.

Spark-first design:

- The corpus collapses to a WORD-FREQUENCY table first (one shuffle);
  every subsequent pass runs over distinct words only — at 100 TB the
  distinct-word table is orders of magnitude smaller than the corpus,
  which is exactly how production BPE trainers (and word2vec et al.)
  scale.
- Each iteration is: one row-local pair-extraction + one aggregation
  for the arg-max pair (fully tie-broken: count DESC, then pair text
  ASC), then a row-local fold that applies the merge to every word.
  No driver-side loop over words — only the single winning pair is
  collected per iteration.
- The merge application is a single left-fold (``F.aggregate``) with a
  (done, pending) accumulator — no index lambdas (PERF.md: index
  lambdas re-evaluate their subtree per element).
- Lineage is truncated per iteration via ``session.pin_iter`` (eager
  localCheckpoint; reliable checkpoint under SPARK_GRAFT_PIN_MODE=
  reliable — the plan would otherwise double per iteration) and the
  superseded superstep is ``unpin``'d.

Determinism: counts are exact integers; the arg-max is fully
tie-broken; symbol folds are order-fixed per row — the merge list is
bit-identical at any parallelism. Correctness is gated by
tests/test_llmops.py::test_bpe_matches_reference_implementation, which
recomputes the merges with an independent pure-Python BPE on the same
corpus (an exact, not statistical, check — stronger than a SQL oracle
here because the iteration cannot be expressed as one SQL statement
without unrolling a data-dependent rewrite per step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from weather_analysis_bigdata__spark.session import pin, pin_iter, unpin


def _word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq) with words lowercased and split on
    whitespace. The one pass that touches every row."""
    return (
        docs.select(
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias(
                "word"
            )
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _adjacent_pairs(symbols: F.Column) -> F.Column:
    """Adjacent symbol pairs as 'a b' strings — zip_with over shifted
    slices (the O(n) shingle pattern from functions/textops.py)."""
    m = F.greatest(F.size(symbols) - 1, F.lit(0))
    return F.zip_with(
        F.slice(symbols, 1, m),
        F.slice(symbols, 2, m),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )


def _apply_merge(symbols: F.Column, left: str, right: str) -> F.Column:
    """One BPE merge pass: replace every non-overlapping adjacent
    (left, right) with left+right, left-to-right — a single fold with a
    (done, pending) accumulator, matching the reference algorithm's
    scan order."""
    merged = left + right
    init = F.struct(
        F.array().cast("array<string>").alias("done"),
        F.lit("").alias("pending"),  # "" = no pending symbol
    )

    def step(acc, s):
        take_merge = (acc.pending == F.lit(left)) & (s == F.lit(right))
        return F.struct(
            F.when(take_merge, F.concat(acc.done, F.array(F.lit(merged))))
            .when(acc.pending == "", acc.done)
            .otherwise(F.concat(acc.done, F.array(acc.pending)))
            .alias("done"),
            F.when(take_merge, F.lit("")).otherwise(s).alias("pending"),
        )

    def finish(acc):
        return F.when(
            acc.pending == "", acc.done
        ).otherwise(F.concat(acc.done, F.array(acc.pending)))

    return F.aggregate(symbols, init, step, finish)


def train_bpe_merges(
    docs: DataFrame, n_merges: int = 10, text_col: str = "text"
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns
    [(rank, left, right, pair_freq), ...] in merge order."""
    words = _word_freqs(docs, text_col).transform(pin)
    state = words.select(
        F.split(F.col("word"), "").alias("symbols"), "freq"
    ).transform(pin_iter)
    unpin(words)  # folded into the pinned state; release

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            state.select(
                F.explode(_adjacent_pairs(F.col("symbols"))).alias("pair"),
                "freq",
            )
            .groupBy("pair")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, n = best[0].pair, best[0].n
        left, right = pair.split(" ", 1)
        merges.append((rank, left, right, int(n)))
        prev = state
        state = state.select(
            _apply_merge(F.col("symbols"), left, right).alias("symbols"),
            "freq",
        ).transform(pin_iter)
        unpin(prev)
    return merges


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge list to every document (row-local).

    Each word splits to characters and the merges fold over it in
    training order — the exact inference-side of train_bpe_merges.
    Returns (doc columns…, n_chars_sym, n_bpe_tokens): symbol counts
    before/after merging, summed over the document's words.
    """
    def tokenize_word(word_syms: F.Column) -> F.Column:
        out = word_syms
        for _, left, right, _ in merges:
            out = _apply_merge(out, left, right)
        return out

    words = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda w: w != "",
    )
    per_word_before = F.transform(words, lambda w: F.size(F.split(w, "")))
    per_word_after = F.transform(
        words, lambda w: F.size(tokenize_word(F.split(w, "")))
    )
    total = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda a, x: a + x
    )
    return docs.withColumns(
        {
            "n_chars_sym": total(per_word_before),
            "n_bpe_tokens": total(per_word_after),
        }
    )
