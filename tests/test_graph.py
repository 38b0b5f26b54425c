"""connected_components unit tests: synthetic graphs with known
components, including a chain whose diameter forces multiple
propagation rounds (the fixpoint loop, not just one join)."""

from __future__ import annotations

from flink_cep_examples_spark.operators.graph import connected_components


def _components(spark, edges, driver_edge_limit=None):
    df = spark.createDataFrame(edges, ["a", "b"])
    kw = (
        {}
        if driver_edge_limit is None
        else {"driver_edge_limit": driver_edge_limit}
    )
    return {
        r.id: r.component
        for r in connected_components(df, **kw).collect()
    }


def test_chain_collapses_to_min_label(spark):
    # 1-2-3-4-5 chain: diameter 4 -> needs >1 round; all label to 1
    got = _components(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_components_keep_separate_labels(spark):
    got = _components(spark, [(10, 20), (20, 30), (40, 50), (60, 70)])
    assert got == {10: 10, 20: 10, 30: 10, 40: 40, 50: 40, 60: 60, 70: 60}


def test_triangle_plus_pendant(spark):
    # triangle {3,7,9} + pendant 11 off 9; edge direction immaterial
    got = _components(spark, [(7, 3), (9, 7), (3, 9), (11, 9)])
    assert got == {3: 3, 7: 3, 9: 3, 11: 3}


def _union_find(edges):
    """Independent reference: path-compressed union-find."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of the component
    comp = {}
    for x in list(parent):
        comp.setdefault(find(x), []).append(x)
    return {x: root for root, xs in comp.items() for x in xs}


def test_random_graphs_match_union_find(spark):
    """Property: on deterministic pseudo-random graphs the distributed
    min-label propagation equals an independent union-find."""
    import hashlib

    def h(i, salt):
        return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16)

    for salt in range(3):
        n_nodes, n_edges = 40, 35
        edges = [
            (h(i, salt) % n_nodes, h(i + 1000, salt) % n_nodes)
            for i in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        # small graph -> driver union-find fast path
        assert _components(spark, edges) == _union_find(edges), salt
        # force the DISTRIBUTED min-label loop and require the same answer
        assert (
            _components(spark, edges, driver_edge_limit=0)
            == _union_find(edges)
        ), salt


def test_wide_string_ids_force_distributed_path(spark):
    """The driver fast path is bounded by estimated collected BYTES,
    not edge count: a handful of edges with very wide string ids must
    take the distributed loop (byte cap) yet still produce the
    union-find answer."""
    wide = [("x" * 200_000 + str(i), "x" * 200_000 + str(i + 1)) for i in range(4)]
    df = spark.createDataFrame(wide, ["a", "b"])
    got = {
        r.id: r.component
        for r in connected_components(df, driver_byte_limit=1_000_000).collect()
    }
    assert got == _union_find(wide)
    # same graph under the default (ample) byte cap -> driver path, same answer
    got_drv = {
        r.id: r.component for r in connected_components(df).collect()
    }
    assert got_drv == got


def test_pointer_doubling_matches_and_halves_rounds(spark):
    """Property (VERDICT r2 item 7): on a path graph — the worst case
    for plain propagation (rounds = diameter) — pointer doubling yields
    the identical labels in O(log d) rounds."""
    from pyspark.sql import functions as F

    from flink_cep_examples_spark.operators.graph import (
        _distributed_components,
    )

    n = 40  # path 0-1-...-40: diameter 40
    edges = [(i, i + 1) for i in range(n)]
    df = spark.createDataFrame(edges, ["a", "b"]).localCheckpoint()
    e = df.select(F.col("a"), F.col("b"))

    labels_pd, rounds_pd = _distributed_components(e, doubling=True)
    got = {r.id: r.lbl for r in labels_pd.collect()}
    assert got == _union_find(edges)
    # diameter 40 -> plain label_prop needs ~40 rounds; doubling must be
    # logarithmic-ish. 2^10 >> 40, so 10 is a safe O(log d) ceiling.
    assert rounds_pd <= 10, rounds_pd


def test_pointer_doubling_flag_via_public_api(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (9, 8)]
    df = spark.createDataFrame(edges, ["a", "b"])
    got = {
        r.id: r.component
        for r in connected_components(
            df, driver_edge_limit=0, algorithm="pointer_doubling"
        ).collect()
    }
    assert got == _union_find(edges)
