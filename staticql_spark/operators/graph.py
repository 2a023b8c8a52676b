"""Graph propagation operators (beyond-reference analytics family).

The reference engine has no graph surface at all; near-dup clustering
(dedup.connected_components) was the first propagation operator in this
repo, and :func:`pagerank` generalizes the family: iterative message
passing as plain DataFrame joins + map-side-combined aggregations, with
``localCheckpoint`` lineage truncation per round (the standard Spark
iterative-algorithm discipline — without it the plan doubles per
iteration and the driver becomes the bottleneck).

Scale shape per iteration: one equi join of edges⨝ranks on the source id
(both sides hash-partitioned on it), one groupBy-sum keyed by destination
(map-side combined — shuffle volume is |nodes|, not |edges|), and a
1-row dangling-mass aggregate broadcast back.  At 100 TB of edges each
round is two shuffles over node-keyed rows; no step ever materializes to
the driver.

A FIXED small iteration count keeps the whole computation SQL-expressible
by unrolling — the same oracle strategy as similarity.kmeans_fit — so the
``events_pagerank`` driver query gets full value-hash verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
    damping: float = 0.85,
    round_to: int = 6,
) -> DataFrame:
    """PageRank over a directed edge list -> (node, rank).

    Standard power iteration: every node starts at 1/N; each round a node
    sends rank/out_degree along its out-edges, and ranks refresh as
    (1-d)/N + d * (received + dangling_mass/N).  Dangling nodes (no
    out-edges) redistribute their mass uniformly, so total rank stays 1.

    Determinism: no RNG anywhere; the only cross-engine fp sensitivity is
    summation order, handled by rounding the FINAL ranks (``round_to``) —
    with a handful of iterations the accumulated noise stays orders of
    magnitude below the rounding granularity.

    The node count and per-round dangling mass are 1-row aggregates
    broadcast back into the plan (the doc_rebalance idiom) — no driver
    collect in the loop.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n1 = nodes.agg(F.count("*").cast("double").alias("__n"))
    deg = e.groupBy("src").agg(F.count("*").cast("double").alias("__deg"))

    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for _ in range(iters):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("__deg")).alias("__recv"))
        )
        dangling = (
            ranks.join(deg, ranks.node == deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(n1))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("__n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__recv"), F.lit(0.0))
                        + F.col("__dang") / F.col("__n")
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.round("rank", round_to).alias("rank"))
