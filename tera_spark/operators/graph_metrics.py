"""Graph metrics over the materialized KG: deterministic PageRank.

Companion to the connected-components canonicalizer (``canonical.py``) on
the analytics side: once the KG is materialized as an edge table, rank
queries ("which taxa/chemicals are structurally central?") are the natural
next ask. The reference has no rank operator (its graph lives in rdflib /
a SPARQL endpoint); this is one of the beyond-reference large-scale ops,
built Spark-first.

Scale design (the part that must survive 100 TB):

- Fixed iteration count, no convergence threshold → bit-stable run-to-run
  and oracle-replayable (the DuckDB oracle replays the same K iterations
  as a CTE chain).
- Per iteration: one shuffle of the (node-sized) rank table onto the edge
  table's source-hash partitioning (the edge checkpoint is pre-partitioned
  by src, so the fact-sized side never re-shuffles), then the contribution
  ``groupBy(dst)`` shuffle. The degree column rides the rank table, so no
  third table joins into the loop.
- Dangling-node mass (nodes with no out-edges) is redistributed uniformly
  each iteration — the textbook correction, without which rank leaks and
  the distribution no longer sums to 1. The dangling SET is static, so it
  is flagged once on the node table; the per-iteration dangling MASS rides
  the iteration's ``localCheckpoint`` action as an ``observe()`` metric —
  exactly ONE Spark job per iteration, same fused-fingerprint trick as
  ``canonical._checkpoint_fingerprint``.
- ``localCheckpoint`` per iteration keeps the plan constant-size (lineage
  would otherwise grow linearly and re-run every prior round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src_col: str = "u",
    dst_col: str = "v",
) -> DataFrame:
    """PageRank over a directed edge list (string node ids).

    Returns DataFrame(node string, rank double); ranks sum to 1.0. Edges
    are deduplicated and self-loops dropped (simple-graph semantics, the
    convention that makes the result independent of upstream emission
    multiplicity). ``iterations`` power-iteration rounds with uniform
    dangling-mass redistribution — deterministic, no RNG, no threshold.
    """
    e = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
        # pre-partition by src ONCE: checkpoint preserves the hash
        # partitioning, so each iteration's edge⋈rank join re-shuffles only
        # the (node-sized) rank table, never the edge table
        .repartition("u")
        .localCheckpoint()
    )
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    # node count AND initial dangling count ride the checkpoint action as
    # observe() metrics — setup is ONE job, same discipline as the
    # per-iteration dangling-mass fuse below (round-3 verdict item 8)
    obs0 = Observation()
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .join(deg.select(F.col("u").alias("node"), "d"), "node", "left")
        .select("node", F.col("d").isNull().alias("dangling"), "d")
        .observe(
            obs0,
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("dangling"), True)).alias("nd"),
        )
        .localCheckpoint()
    )
    vals = obs0.get
    n = int(vals["n"])
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))

    ranks = nodes.select("node", "dangling", "d", F.lit(1.0 / n).alias("rank"))
    # mass currently sitting on dangling nodes (uniform start)
    dangling_mass = int(vals["nd"]) / n
    for _ in range(iterations):
        contribs = (
            e.join(
                ranks.filter(~F.col("dangling")).select(
                    F.col("node").alias("u"), (F.col("rank") / F.col("d")).alias("share")
                ),
                "u",
            )
            .groupBy("v")
            .agg(F.sum("share").alias("contrib"))
        )
        new_rank = (
            F.lit((1.0 - damping) / n)
            + F.lit(damping) * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dangling_mass / n))
        )
        obs = Observation()
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["v"], "left")
            .select("node", "dangling", "d", new_rank.alias("rank"))
            .observe(
                obs,
                F.sum(F.when(F.col("dangling"), F.col("rank")).otherwise(0.0)).alias("dm"),
            )
            .localCheckpoint()
        )
        dangling_mass = float(obs.get["dm"] or 0.0)
    return ranks.select("node", "rank")
