"""Connected components over a pair graph — iterative min-label
propagation (the union-find step after any near-dup pair generator:
pairs only say "a ~ b"; dedup POLICY needs the transitive cluster).

Algorithm: every node starts labeled with its own id; each round, a
node adopts the min label among itself and its neighbors; fixpoint =
components labeled by their min member id.  Converges in O(diameter)
rounds — near-dup clusters are shallow (duplicates of duplicates), so
a handful of rounds in practice.  Per round: one shuffle (groupBy id).
``localCheckpoint`` every few rounds cuts the growing lineage — the
standard guard for iterative DataFrame algorithms.

The driver-side loop is control flow only (a convergence counter); all
data movement is distributed.  GraphFrames does the same under the
hood; implementing directly avoids the external dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         max_iterations: int = 20) -> DataFrame:
    """(id, comp): comp = min node id reachable from id."""
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .union(edges.select(F.col(dst).alias("a"),
                               F.col(src).alias("b")))
           .distinct().cache())
    labels = (sym.select(F.col("a").alias("id")).distinct()
              .withColumn("comp", F.col("id"))
              .cache())

    prev_sum = object()  # sentinel: never equals a real sum
    for i in range(max_iterations):
        msgs = (sym.join(labels, sym.a == labels.id)
                .select(F.col("b").alias("id"), "comp"))
        new_labels = (labels.union(msgs)
                      .groupBy("id").agg(F.min("comp").alias("comp")))
        # Materialize each round: without this, round N's action would
        # recompute the entire label chain from round 0 (and the pair
        # generator feeding it) — iteration cost would grow linearly.
        if i % 3 == 2:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.cache()
        # ONE action per round: materializes the cache AND yields the
        # convergence signal.  Labels are monotone non-increasing
        # (new = min(old, neighbors)), so the label sum strictly
        # decreases until the fixpoint — equal sums ⟺ zero changed
        # labels, with no old-vs-new join and no second job.
        cur_sum = new_labels.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
        ).collect()[0].s
        labels.unpersist()
        labels = new_labels
        if cur_sum is None or cur_sum == prev_sum:
            break  # empty graph, or fixpoint reached
        prev_sum = cur_sum
    sym.unpersist()
    return labels


def dedup_clusters(pairs: DataFrame, src: str = "id_a",
                   dst: str = "id_b") -> DataFrame:
    """Near-dup pairs → (id, cluster_id, is_canonical): canonical = the
    min-id member; everything else in the cluster is droppable."""
    comp = connected_components(pairs, src, dst)
    return (comp.select(F.col("id"),
                        F.col("comp").alias("cluster_id"),
                        (F.col("id") == F.col("comp"))
                        .alias("is_canonical")))
