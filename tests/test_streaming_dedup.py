"""Stream/batch agreement for streaming dedup: a source containing
every event twice (full-row duplicates) must come out exactly once
under ``dedup_exact_stream`` / ``dedup_content_stream``, matching the
batch ``dropDuplicates`` answer. Full-row duplicates make the
first-occurrence choice immaterial, so set equality is exact."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_cep_examples_spark.sources.tables import load_table
from flink_cep_examples_spark.streaming.dedup_stream import (
    dedup_content_stream,
    dedup_exact_stream,
)


@pytest.fixture(scope="module")
def doubled_events_dir(spark, sf_small, tmp_path_factory):
    """sf0.001 events written twice into one parquet dir — every row is
    an exact duplicate pair."""
    out = str(tmp_path_factory.mktemp("dedup_stream") / "events")
    ev = load_table(spark, sf_small, "events").coalesce(2)
    ev.write.parquet(out)
    ev.write.mode("append").parquet(out)
    return out


def _run_stream(spark, src_dir, build, name):
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = (
        build(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


@pytest.mark.slow
def test_exact_dedup_stream_matches_batch(spark, doubled_events_dir):
    src = spark.read.parquet(doubled_events_dir)
    assert src.count() == 2 * src.select("event_id").distinct().count()

    out = _run_stream(
        spark,
        doubled_events_dir,
        lambda s: dedup_exact_stream(s, ["event_id"]),
        "dedup_exact_mem",
    )
    batch = src.dropDuplicates(["event_id"])
    assert out.count() == batch.count()
    assert sorted(r.event_id for r in out.select("event_id").collect()) == sorted(
        r.event_id for r in batch.select("event_id").collect()
    )


@pytest.mark.slow
def test_content_dedup_stream_keys_on_digest(spark, doubled_events_dir):
    """Content keying: dedup on md5(props) — distinct prop payloads
    survive exactly once each."""
    src = spark.read.parquet(doubled_events_dir)
    n_payloads = src.select("props").distinct().count()

    out = _run_stream(
        spark,
        doubled_events_dir,
        lambda s: dedup_content_stream(s, content_col="props"),
        "dedup_content_mem",
    )
    assert out.count() == n_payloads
    assert out.select("content_key").distinct().count() == n_payloads
