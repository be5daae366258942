"""Distributed connected components over duplicate-pair edge sets.

The missing last stage of a real dedup pipeline: pair finders
(operators/dedup.py) emit near-duplicate EDGES; keeping one doc per
duplicate CLASS requires the transitive closure — connected components —
so that a~b, b~c collapses {a,b,c} into one cluster even though (a,c)
was never emitted as a pair.

Algorithm: min-label propagation with POINTER JUMPING. Each round every
node takes the min of (its label, its neighbors' labels, its label's
label). The neighbor step alone converges in O(diameter) rounds; the
pointer-jumping step (label := label-of-label, i.e. path halving) makes
chains collapse in O(log n) — the same doubling idea as the
large-star/small-star MapReduce algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14). Per round: two shuffles
(neighbor-min groupBy + label-of-label join), each carrying only
(node:int64, label:int64) rows — never document payloads.

Scale notes (100 TB corpus → 10^9..10^10 nodes): the label frame is two
8-byte columns regardless of document size; rounds are O(log n) ≈ 30-35
worst case, and real dedup-cluster diameters are tiny (near-dup clusters
are cliques-ish), so 3-5 rounds dominate in practice. Each round is
checkpointed through operators.fixpoint._checkpoint_fresh_stats — the
same estimated-stats-compounding landmine hunted down for the BSP
dataflow engine applies to any iterative DataFrame loop.

Reference parity: the reference engine has no graph stage; this is part
of the training-data-pipeline surface the brief adds on top of the
reference's operator set (cf. utils/src/cfg.rs builds static graphs but
never computes components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parallel_dataflow_spark.operators.fixpoint import _checkpoint_fresh_stats


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable
    from ``node`` over the undirected edge set. Nodes are the vertices
    incident to at least one edge; isolated vertices don't appear (callers
    attach singletons with a left join — see dedup_clusters).

    Deterministic: the component id is the canonical min-id member, so the
    result is unique regardless of partitioning, round count, or schedule.
    """
    und = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .unionByName(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .dropDuplicates(["node", "nbr"])
    )
    und = _checkpoint_fresh_stats(und)

    lab = und.groupBy("node").agg(F.least(F.min("nbr"), F.min("node")).alias("label"))
    lab = _checkpoint_fresh_stats(lab)

    for _ in range(max_rounds):
        # neighbor min: the smallest label in each node's open neighborhood
        nmin = (
            und.join(lab.withColumnRenamed("node", "nbr"), "nbr")
            .groupBy("node")
            .agg(F.min("label").alias("nbr_label"))
        )
        # the OLD label rides along so the convergence flag is computed in
        # the same pass — a separate new-vs-old join per round would add a
        # redundant whole-frame shuffle (the run_bsp chg-flag pattern)
        stepped = (
            lab.join(nmin, "node", "left")
            .select(
                "node",
                F.col("label").alias("old_label"),
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            )
        )
        # pointer jumping: label := min(label, label(label)) — path halving
        jump = lab.select(
            F.col("node").alias("label"), F.col("label").alias("jump_label")
        )
        final = F.least(F.col("label"), F.coalesce("jump_label", "label"))
        new_lab = (
            stepped.join(jump, "label", "left")
            .select(
                "node",
                final.alias("label"),
                (final != F.col("old_label")).alias("chg"),
            )
        )
        new_lab = _checkpoint_fresh_stats(new_lab)
        # no-shuffle convergence read off the checkpointed frame
        changed = new_lab.filter("chg").limit(1).count()
        lab = new_lab.select("node", "label")
        if changed == 0:
            return lab.select("node", F.col("label").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")
