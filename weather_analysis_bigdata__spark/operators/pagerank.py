"""PageRank with exact fixed-point (scaled-integer) arithmetic.

Iterative graph algorithms are the second operator class (after
connected components, operators/components.py) that SQL alone can't
express at scale. This PageRank keeps every superstep in exact BIGINT
arithmetic so the result is bit-identical across engines, partitionings
and reduction orders — the repo's determinism rule applied to an
iterative numeric algorithm:

- ranks are fixed-point integers scaled by 10^10;
- the damping multiply-divide is ``(rank · 85 · w) div (100 · out_w)``
  — floor division of non-negative BIGINTs (identical to DuckDB ``//``);
- per-node contributions are summed as integers (order-free).

Floor-truncation loses < 1 ulp of mass per edge per step — irrelevant
for ranking and a price happily paid for cross-engine reproducibility.
Dangling nodes (no out-edges) leak their damped mass, the standard
simplification; the base term keeps every node positive.

Scale design: each superstep is join(ranks ⋈ edges on src) +
groupBy(dst) — both shuffle on node id; ranks is broadcast when the
node set is small (event-type graphs) and hash-joined otherwise.
Lineage is truncated per superstep via session.pin_iter (eager
localCheckpoint; reliable checkpoint in reliable mode), same as
components.py — without truncation the plan doubles per iteration —
and the superseded superstep is unpin'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from weather_analysis_bigdata__spark.session import pin, pin_iter, unpin

SCALE = 10_000_000_000  # 10^10 fixed-point


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """edges(src, dst, w: long) → (node, rank_scaled: long).

    ``sum(rank_scaled) ≈ SCALE`` (minus truncation + dangling leakage).
    """
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    e = edges.join(out_w, "src").transform(pin)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .transform(pin)
    )
    n = nodes.count()
    base = (damping_den - damping_num) * SCALE // (damping_den * n)
    ranks = nodes.select(
        "node", F.lit(SCALE // n).cast("long").alias("rank_scaled")
    )
    contrib = f"(rank_scaled * {damping_num} * w) div ({damping_den} * out_w)"
    for _ in range(iters):
        sums = (
            e.join(F.broadcast(ranks), e["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), F.expr(contrib).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        prev = ranks
        ranks = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("in_mass"), F.lit(0)))
                .cast("long")
                .alias("rank_scaled"),
            )
            .transform(pin_iter)
        )
        unpin(prev)  # the new pin is materialized; release the superseded one
    return ranks
