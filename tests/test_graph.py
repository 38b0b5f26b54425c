"""connected_components unit tests: synthetic graphs with known
components, including a chain whose diameter forces multiple
propagation rounds (the fixpoint loop, not just one join)."""

from __future__ import annotations

from flink_cep_examples_spark.operators.graph import connected_components


def _components(spark, edges):
    df = spark.createDataFrame(edges, ["a", "b"])
    return {
        r.id: r.component for r in connected_components(df).collect()
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
