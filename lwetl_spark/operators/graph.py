"""Iterative graph algorithms over edge DataFrames (NEW — no reference
analog; complements dedup.connected_components*, the other iterative
family in this engine).

PageRank here is the canonical loop-unrolled iterative dataflow: each
iteration is (join ranks to edges on src) → (groupBy dst, sum) →
(left join back to the node set).  Spark-first notes:

- the edge list and out-degrees are loop-invariant → computed once and
  persisted; only the rank table changes per iteration.
- lineage doubles per iteration; for the handful of iterations used
  here persist() on the invariants is enough, beyond ~10 iterations
  checkpoint the rank table to truncate the plan (same guidance as
  connected_components_two_phase).
- each iteration costs exactly one shuffle (the dst aggregation) when
  ranks stay co-partitioned with edges on src; Catalyst reuses the
  edge-side exchange across iterations.
- dangling nodes (no out-edges) leak their mass — the simple PageRank
  variant.  Deterministic and documented; the redistribute variant adds
  one scalar agg per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    digits: int = 6,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    r_0(v) = 1/N;  r_{i+1}(v) = (1−d)/N + d·Σ_{u→v} r_i(u)/outdeg(u).

    Float determinism: every per-edge contribution is the same IEEE
    division in any engine; per-node sums are order-dependent in the
    last ulps, so results are rounded to ``digits`` (the repo-wide
    float-aggregate convention).  Returns (node, rank).

    ``checkpoint_every=N`` (VERDICT r1 #8) truncates the rank table's
    lineage every N iterations via an eager localCheckpoint — required
    past ~10 iterations where the doubled-per-iteration plan otherwise
    dominates driver planning time.  Values are unchanged (pinned by
    test_grouped): checkpointing moves materialization, not math.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()  # one scalar job; also materializes the persist
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    e_deg = e.join(outdeg, "src").persist()

    base = (1.0 - damping) / n_nodes
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for it in range(iterations):
        if checkpoint_every and it and it % checkpoint_every == 0:
            # eager local checkpoint: cuts lineage so plan size stays O(N)
            # instead of O(2^iterations); spill-backed, no HDFS dir needed
            ranks = ranks.localCheckpoint(eager=True)
        contribs = e_deg.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select(
            F.col("dst").alias("node"),
            (F.col("rank") / F.col("outdeg")).alias("contrib"),
        )
        summed = contribs.groupBy("node").agg(F.sum("contrib").alias("s"))
        ranks = nodes.join(summed, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
    return ranks.select("node", F.round("rank", digits).alias("rank"))
