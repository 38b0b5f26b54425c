"""Stream-static enrichment (stream/batch agreement + per-batch dim
refresh) and the idempotent foreachBatch parquet sink (replaying a
batch must not duplicate rows)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_cep_examples_spark.sources.tables import load_table
from flink_cep_examples_spark.streaming.enrich import stream_static_join
from flink_cep_examples_spark.streaming.sinks import (
    read_idempotent,
    write_stream_idempotent,
)


def _dim(spark, rows):
    return spark.createDataFrame(rows, "user_id long, tier string")


@pytest.mark.slow
def test_stream_static_join_matches_batch(spark, sf_small, tmp_path):
    src = str(tmp_path / "ev")
    load_table(spark, sf_small, "events").coalesce(2).write.parquet(src)
    # deliberately partial: odd user_ids have no dim row (left-join nulls)
    dim = _dim(
        spark,
        [(i, "gold" if i % 3 == 0 else "basic") for i in range(0, 200, 2)],
    )

    batch = stream_static_join(spark.read.parquet(src), dim, "user_id")
    b = sorted((r.event_id, r.tier) for r in batch.collect())

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_static_join(stream, dim, "user_id")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("enrich_mem")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    s = sorted(
        (r.event_id, r.tier) for r in spark.table("enrich_mem").collect()
    )
    assert b == s
    assert any(t == "gold" for _, t in b) and any(t is None for _, t in b)


def test_stream_static_rejects_right_joins(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        stream_static_join(df, df, "id", how="right")


@pytest.mark.slow
def test_dim_refresh_via_foreach_batch(spark, tmp_path):
    """enrich_in_foreach_batch re-reads the dim per micro-batch: rows
    arriving in batch 2 see the dim rewritten after batch 1 ran."""
    import glob
    import shutil

    src = tmp_path / "in"
    src.mkdir()
    dimdir = str(tmp_path / "dim")
    _dim(spark, [(1, "old")]).write.parquet(dimdir)

    def add_file(rows, name):
        stage = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(
            rows, "event_id long, user_id long"
        ).coalesce(1).write.parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        shutil.copy(part, str(src / f"{name}.parquet"))

    add_file([(1, 1)], "f1")
    schema = spark.read.parquet(str(src / "f1.parquet")).schema
    stream = spark.readStream.schema(schema).parquet(str(src))

    from flink_cep_examples_spark.streaming.enrich import (
        enrich_in_foreach_batch,
    )

    collected: dict[int, str] = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            collected[r.event_id] = r.tier

    q = enrich_in_foreach_batch(
        stream, dimdir, "user_id", sink, str(tmp_path / "chk")
    )
    try:
        q.processAllAvailable()
        # rewrite the dim in place; the NEXT batch must see it
        _dim(spark, [(1, "new")]).write.mode("overwrite").parquet(dimdir)
        add_file([(2, 1)], "f2")
        q.processAllAvailable()
    finally:
        q.stop()
    assert collected == {1: "old", 2: "new"}


@pytest.mark.slow
def test_idempotent_sink_replay_does_not_duplicate(spark, sf_small, tmp_path):
    src = str(tmp_path / "ev_sink")
    ev = load_table(spark, sf_small, "events").select(
        "event_id", "user_id", "value"
    )
    ev.coalesce(2).write.parquet(src)
    schema = spark.read.parquet(src).schema
    out_path = str(tmp_path / "landed")
    chk = str(tmp_path / "chk_sink")

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = write_stream_idempotent(stream, out_path, chk)
        q.awaitTermination(120)

    run()
    first_rows = sorted(map(tuple, read_idempotent(spark, out_path).collect()))
    n_src = spark.read.parquet(src).count()
    assert len(first_rows) == n_src

    # simulate a replay: wipe the checkpoint so the SAME input is
    # delivered again as the same batch ids — the partition overwrite
    # must absorb it (no duplicates), not append
    import shutil

    shutil.rmtree(chk)
    run()
    # the rewrite replaced the partition's files; refresh the listing
    # before re-reading (reader-after-writer hygiene)
    spark.catalog.refreshByPath(out_path)
    again = sorted(map(tuple, read_idempotent(spark, out_path).collect()))
    assert again == first_rows
