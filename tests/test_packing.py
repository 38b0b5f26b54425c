"""Sequence packing: budget invariants, oversize handling, and
partitioning-independence (the oracle differential in
test_oracle_extensions pins the exact fold against DuckDB's recursive
CTE)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_cep_examples_spark.queries import QUERIES, load_all
from flink_cep_examples_spark.queries.packing import (
    TOKEN_BUDGET,
    pack_sequences,
)

load_all()


def _toy(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_pack_respects_budget_and_order(spark):
    # one bucket's worth of ids (same bucket not required — invariants
    # hold per (bucket, pack_seq) regardless)
    rows = [(i, t) for i, t in enumerate([100, 100, 100, 200, 56, 1])]
    out = pack_sequences(_toy(spark, rows)).collect()
    by_pack = {}
    for r in out:
        by_pack.setdefault((r.bucket, r.pack_seq), []).append(r)
    for members in by_pack.values():
        total = sum(m.n_tokens for m in members if not m.truncated)
        if not any(m.truncated for m in members):
            assert total <= TOKEN_BUDGET
        # positions are 0..k-1 in doc_id order
        members.sort(key=lambda m: m.pack_pos)
        assert [m.pack_pos for m in members] == list(range(len(members)))
        assert [m.doc_id for m in members] == sorted(
            m.doc_id for m in members
        )


def test_oversize_doc_sits_alone(spark):
    rows = [(1, 10), (2, TOKEN_BUDGET + 50), (3, 10)]
    out = pack_sequences(_toy(spark, rows)).collect()
    fat = next(r for r in out if r.doc_id == 2)
    assert fat.truncated
    assert [
        r.doc_id for r in out if (r.bucket, r.pack_seq) == (fat.bucket, fat.pack_seq)
    ] == [2]


def test_packing_partition_invariant(spark):
    """The coordinate assignment is a pure function of the corpus —
    input partitioning must not matter."""
    rows = [(i, (i * 37) % 300 + 1) for i in range(200)]
    a = pack_sequences(_toy(spark, rows).repartition(1)).collect()
    b = pack_sequences(_toy(spark, rows).repartition(13)).collect()
    key = lambda r: r.doc_id  # noqa: E731
    assert sorted(map(tuple, a), key=lambda t: t[0]) == sorted(
        map(tuple, b), key=lambda t: t[0]
    )


def test_every_doc_packed_exactly_once(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    out = QUERIES["docs_pack_sequences"](spark, sf_small)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    # no pack of non-truncated docs exceeds the budget
    bad = (
        out.filter(~F.col("truncated"))
        .groupBy("bucket", "pack_seq")
        .agg(F.sum("n_tokens").alias("fill"))
        .filter(F.col("fill") > TOKEN_BUDGET)
        .count()
    )
    assert bad == 0
