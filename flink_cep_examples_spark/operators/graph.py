"""Distributed graph operators. Currently: connected components by
min-label propagation (Pregel-lite) with a pointer-doubling variant —
the building block behind near-dup clustering
(queries/dedup.py::dedup_clusters).

Scale notes: each label-propagation round is one shuffle (edge join on
the label side's id + a map-side-combinable min); the number of rounds
equals the largest component diameter. Labels and the edge set are
localCheckpoint'ed so lineage stays flat across rounds and upstream
(possibly expensive) edge derivation runs exactly once. The driver
holds only the per-round changed-count scalar. For dup-cluster graphs
(tiny, dense components) this converges in 2-3 rounds; for
long-diameter graphs ``algorithm="pointer_doubling"`` adds a label
self-join per round that shortcuts label chains, reaching the fixpoint
in O(log d) rounds (hash-to-min style) at the cost of a second shuffle
per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


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


#: Edge-count cap for the driver union-find fast path: a dup-pair graph
#: is a vanishing fraction of the corpus (the LSH gate already pruned
#: it), so even a 100 TB corpus rarely exceeds this.
DRIVER_EDGE_LIMIT = 2_000_000

#: Estimated-bytes cap for the same path — edges × per-edge Python heap
#: footprint, NOT just edge count: 2M edges of long string ids would be
#: hundreds of collected MB where 2M int64 pairs are ~100 MB. Estimated
#: per-value overheads below are CPython object sizes (str header ~49B,
#: boxed int ~28B); when either cap trips, the distributed loop — which
#: never collects anything but the changed-count scalar — takes over.
DRIVER_BYTE_LIMIT = 128 * 2**20


def _edge_value_bytes(v) -> int:
    """Estimated collected Python-heap bytes for one edge endpoint —
    the Python twin of the old SQL estimate (str header ~49B over the
    UTF-8 payload — octet semantics, length undercounts up to 4x on
    non-ASCII ids; boxed int ~28B), applied to ALREADY-collected rows
    so the estimate costs no extra Spark action."""
    if isinstance(v, str):
        return len(v.encode("utf-8")) + 49
    if isinstance(v, (bytes, bytearray)):
        return len(v) + 49
    return 28


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    driver_edge_limit: int = DRIVER_EDGE_LIMIT,
    driver_byte_limit: int = DRIVER_BYTE_LIMIT,
    algorithm: str = "label_prop",
) -> DataFrame:
    """Undirected connected components of the (src, dst) edge set.

    Returns (id, component) for every node appearing in an edge, where
    ``component`` is the minimum node id of its component — a
    deterministic canonical label whatever the execution order.

    Hybrid execution: the edge set is materialized once (it feeds
    every round anyway); if BOTH the edge count and the estimated
    collected byte size are under the driver caps — the normal case
    for near-dup pair graphs — a driver-side union-find replaces the
    iterative shuffle loop (one job instead of ~2 per round). All
    paths produce the identical min-label mapping;
    ``driver_edge_limit=0`` forces the distributed loop.

    ``algorithm``: ``"label_prop"`` (1 shuffle/round, rounds = component
    diameter — right for shallow dup clusters) or ``"pointer_doubling"``
    (2 shuffles/round, O(log d) rounds — right for long-diameter
    graphs such as chained near-dup paths).
    """
    if algorithm not in ("label_prop", "pointer_doubling"):
        raise ValueError(
            f"unknown algorithm {algorithm!r}: "
            "expected 'label_prop' or 'pointer_doubling'"
        )
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.localCheckpoint()
    if driver_edge_limit > 0:
        # ONE bounded action replaces the old count/bytes stats job +
        # the separate full collect (round-17, guide §1.2): collect at
        # most limit+1 edges off the checkpointed blocks; if the cap is
        # not hit those rows ARE the edge list — no second pass. The
        # byte estimate runs over the collected rows in Python (same
        # formula as before), costing no extra action; when either cap
        # trips, the bounded probe is discarded and the distributed
        # loop — which never collects more than the changed-count
        # scalar — takes over. initialNumPartitions pins the probe to
        # ONE job: CollectLimit otherwise scans 1, then 4x-more
        # partitions per retry while the limit is unreached — several
        # jobs to read a frame we expect to read whole.
        sess = e.sparkSession
        key = "spark.sql.limit.initialNumPartitions"
        prev = sess.conf.get(key, None)
        sess.conf.set(key, str(1 << 30))
        try:
            rows = e.limit(driver_edge_limit + 1).collect()
        finally:
            if prev is None:
                sess.conf.unset(key)
            else:
                sess.conf.set(key, prev)
        if len(rows) <= driver_edge_limit and (
            sum(
                _edge_value_bytes(r.a) + _edge_value_bytes(r.b) + 60
                for r in rows
            )
            <= driver_byte_limit
        ):
            out_schema = T.StructType(
                [
                    T.StructField("id", e.schema["a"].dataType),
                    T.StructField("component", e.schema["a"].dataType),
                ]
            )
            pairs = [(r.a, r.b) for r in rows]
            return _driver_components(e.sparkSession, pairs, out_schema)
    labels, _ = _distributed_components(
        e, doubling=(algorithm == "pointer_doubling")
    )
    return labels.select("id", F.col("lbl").alias("component"))


def _distributed_components(
    e: DataFrame, doubling: bool
) -> tuple[DataFrame, int]:
    """The iterative loop; returns (labels, rounds) — rounds exposed so
    tests can pin the O(log d) claim, not just the result."""
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
    rounds = 0
    while True:
        rounds += 1
        # One shuffle (the groupBy on a): `ud` is pre-hashed on b,
        # `labels` on id, and the label-update join keys land
        # co-partitioned too.
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
        if doubling:
            # Pointer-doubling shortcut: every label value is itself a
            # node id, so replace lbl with that node's (just-updated)
            # label — label chains halve instead of shrinking one hop.
            # Labels only decrease toward the component min, so the
            # shortcut never changes the fixpoint, only the round count.
            ptr = new_labels.select(
                F.col("id").alias("lbl"), F.col("lbl").alias("plbl")
            )
            new_labels = (
                new_labels.join(ptr, "lbl", "left")
                .select(
                    "id",
                    "old_lbl",
                    F.least(
                        F.col("lbl"), F.coalesce(F.col("plbl"), F.col("lbl"))
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
    return labels, rounds
