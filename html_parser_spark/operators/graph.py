"""Link-graph analytics: distributed PageRank.

Beyond-the-reference training-data operator (same family as
operators/curate.py): web-corpus pipelines use centrality over the
hyperlink graph (PageRank / harmonic centrality, as in the
CommonCrawl ranking releases) as a document-quality prior for
curation and sampling.  The edge list is exactly what
``html_ops.links_udf`` mines from the corpus.

Pure DataFrame iteration — the same checkpointed-loop technique as
``dedup.connected_components``:

* per iteration: the contribution aggregation (one shuffle keyed on
  the destination node), a node-keyed join of the static node frame
  against the aggregated contributions, and a scalar dangling-mass
  aggregate over a precomputed is_dangling flag (a filter + tree
  reduce — the dangling-node SET is static, so no per-iteration
  anti-join); the two scalars ride broadcast 1-row frames;
* the damping update is the standard full formula with dangling-mass
  redistribution, so ranks stay a probability distribution
  (sum == 1) even when nodes have no out-links;
* parallel edges are counted per-edge (a page linking twice passes
  twice the mass share), matching the multigraph the link miner
  emits;
* ``localCheckpoint`` every ``checkpoint_every`` iterations truncates
  the growing lineage, keeping plan size O(1) in the iteration count.

Scale notes: at web scale the contribution aggregation shuffles
O(|E|) rows per iteration on uniform-ish node keys; hub pages (high
in-degree) are absorbed by map-side partial sums.  Nothing collects
to the driver — the scalar totals ride broadcast 1-row frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """PageRank over a directed (multi)graph given as an edge list.
    Returns ``(node, rank)`` for every node that appears as a source
    or destination; ranks sum to 1.

    ``rank_{t+1}(v) = (1 - d)/N
                      + d * (sum over in-edges (u,v) of
                             rank_t(u)/out_deg(u)
                             + dangling_mass_t / N)``
    """
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n_df = nodes.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))
    out_deg = edges.groupBy(F.col(src).alias("u")).agg(
        F.count(F.lit(1)).cast("double").alias("out_deg"))
    ed = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).join(
        out_deg, "u")
    # the dangling-node SET never changes — flag it ONCE instead of
    # anti-joining the full ranks frame every iteration
    base = (
        nodes.crossJoin(F.broadcast(n_df))
        .join(out_deg.select(F.col("u").alias("node"),
                             F.lit(False).alias("is_dangling")),
              "node", "left")
        .withColumn("is_dangling",
                    F.coalesce(F.col("is_dangling"), F.lit(True)))
    )
    ranks = base.select(
        "node", "is_dangling",
        (F.lit(1.0) / F.col("n_nodes")).alias("rank"))
    for i in range(n_iter):
        contrib = (
            ed.join(ranks.select(F.col("node").alias("u"), "rank"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("in_mass"))
        )
        dang = ranks.where("is_dangling").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling"))
        ranks = (
            base.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node", "is_dangling",
                (
                    F.lit(1.0 - damping) / F.col("n_nodes")
                    + F.lit(damping)
                    * (F.coalesce(F.col("in_mass"), F.lit(0.0))
                       + F.col("dangling") / F.col("n_nodes"))
                ).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    return ranks.select("node", "rank")
