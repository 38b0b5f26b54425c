"""Distributed graph operators. Currently: connected components by
min-label propagation (Pregel-lite) — the building block behind
near-dup clustering (queries/dedup.py::dedup_clusters).

Scale notes: each round is one shuffle (edge join on the label side's
id + a map-side-combinable min); the number of rounds equals the
largest component diameter. Labels and the edge set are
localCheckpoint'ed so lineage stays flat across rounds and upstream
(possibly expensive) edge derivation runs exactly once. The driver
holds only the per-round changed-count scalar. For dup-cluster graphs
(tiny, dense components) this converges in 2-3 rounds; for
long-diameter graphs prefer the pointer-doubling variant (O(log d)
rounds at the cost of a second join per round) before reaching for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _driver_components(spark, pairs, schema) -> DataFrame:
    """Union-find over a collected edge list — the small-graph fast
    path. Returns the identical (id, min-label component) mapping the
    distributed loop computes."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = [(x, find(x)) for x in parent]
    return spark.createDataFrame(rows, schema)


#: edge-count at or below which components run as driver union-find:
#: a dup-pair graph is a vanishing fraction of the corpus (the LSH
#: gate already pruned it), so even a 100 TB corpus rarely exceeds
#: this; the distributed loop remains the correctness-identical
#: fallback when it does.
DRIVER_EDGE_LIMIT = 2_000_000


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    driver_edge_limit: int = DRIVER_EDGE_LIMIT,
) -> DataFrame:
    """Undirected connected components of the (src, dst) edge set.

    Returns (id, component) for every node appearing in an edge, where
    ``component`` is the minimum node id of its component — a
    deterministic canonical label whatever the execution order.

    Hybrid execution: the edge set is materialized once (it feeds
    every round anyway); if it is small — the normal case for near-dup
    pair graphs — a driver-side union-find replaces the iterative
    shuffle loop (one job instead of ~2 per round). Both paths produce
    the identical min-label mapping; ``driver_edge_limit=0`` forces
    the distributed loop.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.localCheckpoint()
    if e.count() <= driver_edge_limit:
        from pyspark.sql import types as T

        out_schema = T.StructType(
            [
                T.StructField("id", e.schema["a"].dataType),
                T.StructField("component", e.schema["a"].dataType),
            ]
        )
        pairs = [(r.a, r.b) for r in e.collect()]
        return _driver_components(e.sparkSession, pairs, out_schema)
    # Partition the (static) symmetric edge set by the per-round join
    # key ONCE; localCheckpoint materializes it with the partitioning
    # recorded, so every round's edge⋈label join reuses it shuffle-free.
    ud = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .repartition(F.col("b"))
        .localCheckpoint()
    )

    labels = (
        ud.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint()
    )
    while True:
        # One shuffle per round (the groupBy on a): `ud` is pre-hashed
        # on b, `labels` on id (distinct seed / previous join output),
        # and the label-update join keys land co-partitioned too.
        nbr_min = (
            ud.join(labels, ud["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(nbr_min, labels["id"] == nbr_min["a"], "left")
            .select(
                "id",
                F.col("lbl").alias("old_lbl"),
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint()
        )
        # Convergence probe reads the just-materialized blocks — no
        # re-join with the previous labels, no extra shuffle.
        changed = new_labels.filter(F.col("lbl") != F.col("old_lbl")).count()
        labels = new_labels.select("id", "lbl")
        if changed == 0:
            break

    return labels.select("id", F.col("lbl").alias("component"))
