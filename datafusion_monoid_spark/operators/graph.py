"""Connected components — near-dup pairs -> dedup clusters.

Pairwise similarity output (MinHash/SimHash/cosine) is not yet a dedup
decision: transitively connected docs form ONE cluster with one kept
representative.  That is connected components over the candidate-pair
graph.

Implementation: iterative minimum-label propagation with POINTER
JUMPING — each round every vertex takes the min label in its
neighborhood, then labels compress through themselves
(label := label(label)), which halves chain lengths and gives
O(log diameter) convergence instead of O(diameter).  Each round is hash
joins + a groupBy min (all partial-agg safe: min is the monoid), with a
driver-side convergence check on a sum(label) monoid fingerprint (labels
are monotonically non-increasing, so an unchanged sum IS the fixed
point — one cheap aggregate instead of a join+count per round).
Checkpointing truncates the lineage each round (iterative-plan hygiene).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datafusion_monoid_spark.plans.inspect import release_local_checkpoint


def connected_components(edges: DataFrame, src: str = "id_a", dst: str = "id_b",
                         max_iter: int = 20) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min
    node id reachable.  Deterministic."""
    bidir = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .cache()
    )
    labels = (
        bidir.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    # convergence via a MONOID FINGERPRINT: labels only ever decrease
    # under min-propagation, so sum(label) strictly decreases until the
    # fixed point — equal sums round-over-round <=> no label changed.
    # One partial-agg job per round instead of a join + count.
    prev_fp: int | None = None
    for _ in range(max_iter):
        # min label over self + neighbors
        nbr = (
            bidir.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "label")
        )
        merged = (
            labels.unionByName(nbr)
            .groupBy("node").agg(F.min("label").alias("label"))
        )
        # pointer jumping: label := label(label)  (labels form a forest
        # pointing at smaller ids, so the lookup always resolves)
        parent = merged.select(F.col("node").alias("p_node"),
                               F.col("label").alias("p_label"))
        new_labels = (
            merged.join(parent, merged.label == parent.p_node, "left")
            .select("node",
                    F.coalesce("p_label", "label").alias("label"))
        ).localCheckpoint(eager=True)
        fp = new_labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]
        # the PREVIOUS round's checkpoint blocks are dead once the new
        # round is materialized — release them instead of letting 20
        # rounds of label tables pile up until the ContextCleaner GCs
        # (ADVICE r4; at scale each round's table is corpus-sized)
        if labels is not new_labels:
            release_local_checkpoint(labels)
        labels = new_labels
        if fp == prev_fp:
            break
        prev_fp = fp
    bidir.unpersist()
    return labels.select("node", F.col("label").alias("component"))
