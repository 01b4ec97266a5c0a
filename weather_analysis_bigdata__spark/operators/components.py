"""Connected components by iterative min-label propagation.

The dedup endgame: candidate-pair edges (from MinHash/LSH, Jaccard,
or fingerprint equality) must become CLUSTERS before "keep one doc per
cluster" can run — and similarity is not transitive, so clusters are
the connected components of the pair graph, not groupBy buckets.

Algorithm: classic BSP label propagation (the simple form of
large-star/small-star, cf. GraphX/GraphFrames' connectedComponents).
Every node starts labeled with its own id; each superstep every node
takes the min of its own and its neighbors' labels; converged when no
label changes. Iterations ≤ graph diameter (≤ log n with star
contractions; plain propagation is O(diameter), which for dedup
graphs — small dense clusters — is tiny).

Scale design (100 TB): each superstep is one join + one aggregate,
both shuffling on node id (a reused partitioning). Lineage is
truncated per iteration with an eager ``localCheckpoint`` — without
it the plan doubles per superstep and stage-submission time explodes
by iteration ~15. The convergence probe collects a single scalar
(LIMIT 1 count), never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from weather_analysis_bigdata__spark.session import (
    pin_iter,
    pin_iter_probed,
    unpin,
)


def connected_components(
    edges: DataFrame, src: str = "u", dst: str = "v", max_iter: int = 25
) -> DataFrame:
    """Components of an undirected edge list → (node, component).

    ``component`` is the minimum node id reachable from ``node`` —
    a deterministic, partitioning-invariant canonical label.
    """
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .transform(pin_iter)
    )
    for _ in range(max_iter):
        nbr = sym.join(
            labels, sym["b"] == labels["node"]
        ).select(F.col("a").alias("node"), "comp")
        new_labels = (
            nbr.unionByName(labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            # Probed-lazy pin: the convergence count below is the
            # action that materializes this superstep's checkpoint —
            # one job per superstep instead of two (round 12).
            .transform(pin_iter_probed)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        unpin(labels)  # new_labels is materialized; release the prior pin
        labels = new_labels
        if changed == 0:
            break
    return labels
