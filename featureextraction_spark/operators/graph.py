"""Connected components over similarity-pair edges — dedup clustering.

A dedup pipeline doesn't end at pairs: near-duplicate PAIRS must become
CLUSTERS (transitive closure) so each group keeps one canonical document.
The reference has no analog (its dedup story stops at the all-pairs
statistics, ``src/training/statistics.py``); this is the standard
min-label-propagation formulation expressed in DataFrames:

    label(v) ← min(label(v), min over neighbors u of label(u))

iterated to fixpoint. Each round is one join + one aggregation — both
shuffle on the vertex id, no driver-side graph. Convergence takes
O(component diameter) rounds; near-dup clusters are shallow (diameter is
bounded by how transitively similar documents can be), so the loop is
short in practice and capped by ``max_iter``. For adversarially long
chains at web scale, switch to the path-doubling variants (large-star /
small-star, Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) — same API, O(log n) rounds.

Lineage control: every iteration's labels are ``localCheckpoint``-ed —
without it the plan doubles per round and Catalyst analysis dominates
wall time by iteration ~10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component_id) for every vertex appearing in ``pairs``.

    ``component_id`` is the minimum vertex id of the component — stable,
    deterministic, and directly usable as the canonical-document key.
    Raises after ``max_iter`` non-converged rounds (pass a larger value
    for adversarially deep graphs, or use a doubling variant).
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .persist()
    )
    try:
        labels = (
            edges.select(F.col("src").alias("id"))
            .distinct()
            .withColumn("lbl", F.col("id"))
            .localCheckpoint()
        )
        for _ in range(max_iter):
            # neighbor labels flow along edges; keep own label in the pool
            msgs = edges.join(
                labels.select(F.col("id").alias("src"), "lbl"), "src"
            ).select(F.col("dst").alias("id"), "lbl")
            new_labels = (
                labels.unionByName(msgs)
                .groupBy("id")
                .agg(F.min("lbl").alias("lbl"))
                .localCheckpoint()
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.lbl") != F.col("o.lbl"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                return labels.select("id", F.col("lbl").alias("component_id"))
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter or use a path-doubling variant for deep graphs"
        )
    finally:
        edges.unpersist()


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Near-dup pair table → (doc_id, cluster_id, cluster_size).

    cluster_id = min doc id of the transitive-closure group (the canonical
    survivor under keep-smallest-id policy); docs not in any pair are not
    emitted (they are their own trivial cluster by definition).
    """
    cc = connected_components(pairs, a_col, b_col)
    sizes = cc.groupBy("component_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return cc.join(sizes, "component_id").select(
        F.col("id").alias("doc_id"),
        F.col("component_id").alias("cluster_id"),
        "cluster_size",
    )
