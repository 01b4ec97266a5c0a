"""Exact distributed heavy hitters via a Misra-Gries candidate pass.

The scalable pattern for "which tokens exceed a frequency share" over
100 TB: a naive GROUP BY token shuffles the full token stream; when the
answer is the tiny set of items above n/k, a two-pass scheme does the
same work with bounded memory and a broadcast-sized shuffle:

1. **Candidate pass** — each partition runs a Misra-Gries summary with
   k counters over its local token stream (mapInPandas, Arrow batches;
   O(k) state per partition, no shuffle). MG guarantees every item with
   local count > n_p/k survives locally; by pigeonhole, any item with
   GLOBAL count > n/k exceeds n_p/k in at least one partition — so the
   union of per-partition candidates is a superset of the true answer.
2. **Exact pass** — recount only the candidates (broadcast semi join —
   the candidate set is ≤ k × partitions, tiny) and keep those with
   count·k > n. Exact integer comparison, no division.

The candidate set DEPENDS on partitioning; the final output does not —
any superset recounts to the same exact answer. That makes the operator
partitioning-invariant at the boundary while using a partitioning-
dependent sketch inside, which is the whole trick.

The corpus is scanned twice (candidates, recount+total); at scale the
tokenized input would be cached or the total piggybacked on pass 1 —
both passes are embarrassingly parallel scans either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_candidates(tok_df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries candidates (≤ k-1 tokens per partition)."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for t in pdf[col]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < k - 1:
                    counters[t] = 1
                else:
                    # Decrement-all: the signature MG step.
                    for key in list(counters):
                        counters[key] -= 1
                        if counters[key] == 0:
                            del counters[key]
        yield pd.DataFrame({"token": list(counters.keys())})

    return tok_df.mapInPandas(summarize, schema="token string")


def frequent_tokens(tok_df: DataFrame, col: str, k: int) -> DataFrame:
    """Tokens with exact count·k > total, found via MG candidates.

    Returns (token, cnt) — exact, partitioning-invariant.
    """
    cands = (
        mg_candidates(tok_df, col, k)
        .distinct()
        .withColumnRenamed("token", "__candidate")
    )
    total = tok_df.agg(F.count(F.lit(1)).alias("n_total"))
    counts = (
        tok_df.join(
            F.broadcast(cands), F.col(col) == F.col("__candidate"), "left_semi"
        )
        .groupBy(F.col(col).alias("token"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.crossJoin(F.broadcast(total)).filter(
        F.col("cnt") * k > F.col("n_total")
    ).select("token", "cnt")
