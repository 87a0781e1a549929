"""Graph analytics as message-passing DataFrame joins (the Pregel shape).

Connected components lives in operators.dedup (it is the dedup clusterer);
this module holds the rank-propagation family. Both share the same scale
contract: an iteration is edges ⋈ state -> groupBy(dst) -> new state, i.e.
one keyed shuffle per round, state frames are node-sized, and nothing about
the graph ever sits on the driver (the only collects are bounded scalars).

Reference: Page, Brin, Motwani, Winograd 1999 ("The PageRank Citation
Ranking"); the reference repo has no graph surface at all -- this is a
north-star extension like the dedup/CC family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ._cache import tracked_persist


def weighted_pagerank(
    edges: DataFrame,
    *,
    n_iter: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
) -> DataFrame:
    """Weighted PageRank over an edge list: ``n_iter`` rounds of
    r'(v) = (1-d)/n + d * sum over u->v of r(u) * w(u,v) / outw(u),
    from the uniform start. Returns (node, rank).

    Semantics pinned for the dual-engine oracle: dangling-node mass leaks
    (no redistribution -- the simplified textbook recurrence), and both the
    transition probabilities and each round's ranks are quantized to 12 dp,
    which puts double-summation noise (~1e-16 per term) far below the value
    granularity so the result is partitioning- and engine-invariant without
    decimal arithmetic.

    Scale shape: the normalized edge frame is computed once and persisted
    (tracked -- caller releases via release_operator_caches); each round is
    ONE join of edges to the node-sized rank frame on src plus ONE groupBy
    on dst. n_iter is a fixed hyperparameter (rank converges geometrically;
    production runs use 10-20 rounds and, like the CC loop, would truncate
    lineage with a localCheckpoint every few rounds -- at 3 rounds the plan
    stays shallow enough that truncation would only add IO)."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n = nodes.count()  # bounded scalar: node count for the uniform start
    outw = edges.groupBy(src).agg(F.sum(weight).alias("_outw"))
    norm = tracked_persist(
        edges.join(outw, src).select(
            F.col(src).alias("_s"),
            F.col(dst).alias("_d"),
            F.round(F.col(weight) / F.col("_outw"), 12).alias("_p"),
        )
    )
    ranks = nodes.select("node", F.round(F.lit(1.0 / n), 12).alias("rank"))
    for _ in range(n_iter):
        contrib = (
            norm.join(ranks, norm["_s"] == ranks["node"])
            .groupBy("_d")
            .agg(F.sum(F.col("rank") * F.col("_p")).alias("_in"))
        )
        ranks = nodes.join(
            contrib, nodes["node"] == contrib["_d"], "left"
        ).select(
            "node",
            F.round(
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0)),
                12,
            ).alias("rank"),
        )
    return ranks
