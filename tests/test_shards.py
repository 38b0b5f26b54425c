"""Training-shard sink: deterministic membership, partition-invariant
re-runs, file-size caps, and partition-pruned subset reads."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from flink_cep_examples_spark.sources.shards import (
    read_training_shards,
    with_shard,
    write_training_shards,
)

_MIX = 2654435761
_MOD = 1 << 32
N = 8


def _docs(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )


def test_shard_membership_is_pure_function(spark, sf_small, tmp_path):
    docs = _docs(spark, sf_small)
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, "doc_id", N)
    back = read_training_shards(spark, path)
    assert back.count() == docs.count()
    wrong = back.filter(
        F.col("shard") != (F.col("doc_id") * _MIX) % _MOD % N
    ).count()
    assert wrong == 0


def test_rerun_from_different_partitioning_is_identical(
    spark, sf_small, tmp_path
):
    docs = _docs(spark, sf_small)
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(docs.repartition(1), p1, "doc_id", N)
    write_training_shards(docs.repartition(17), p2, "doc_id", N)
    for k in range(N):
        a = [
            tuple(r)
            for r in spark.read.parquet(f"{p1}/shard={k}")
            .orderBy("doc_id")
            .collect()
        ]
        b = [
            tuple(r)
            for r in spark.read.parquet(f"{p2}/shard={k}")
            .orderBy("doc_id")
            .collect()
        ]
        assert a == b


def test_max_records_per_file_caps_files(spark, sf_small, tmp_path):
    docs = _docs(spark, sf_small)
    path = str(tmp_path / "capped")
    write_training_shards(
        docs, path, "doc_id", 2, max_records_per_file=50
    )
    for k in range(2):
        files = glob.glob(f"{path}/shard={k}/*.parquet")
        n_rows = spark.read.parquet(f"{path}/shard={k}").count()
        assert len(files) >= -(-n_rows // 50)  # at least ceil(n/50) files
        for f in files:
            assert spark.read.parquet(f).count() <= 50


def test_subset_read_prunes_partitions(spark, sf_small, tmp_path):
    docs = _docs(spark, sf_small)
    path = str(tmp_path / "pruned")
    write_training_shards(docs, path, "doc_id", N)
    sub = read_training_shards(spark, path, shards=[0, 3])
    got = {r.shard for r in sub.select("shard").distinct().collect()}
    assert got == {0, 3}
    # partition filter reaches the scan: no non-matching dir is read
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
