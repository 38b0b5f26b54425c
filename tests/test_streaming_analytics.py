"""Stream/batch agreement for windowed aggregation and sessionization:
the same expressions run as a plain DataFrame and under Structured
Streaming (file source, append mode) must produce identical finalized
windows. Append mode only emits windows the watermark has closed, so
the comparison is restricted to windows ending before
max(ts) - watermark delay."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_cep_examples_spark.sources.tables import load_table
from flink_cep_examples_spark.streaming.analytics import (
    hourly_by_type_stream,
    sessions_stream,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_small, tmp_path_factory):
    """The sf0.001 events table as a small parquet directory (stream
    source input; normal µs timestamps)."""
    out = str(tmp_path_factory.mktemp("events_stream") / "events")
    load_table(spark, sf_small, "events").coalesce(2).write.parquet(out)
    return out


def _run_stream(spark, events_dir, build, name):
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = build(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


@pytest.mark.slow
def test_hourly_stream_matches_batch(spark, events_dir):
    batch = hourly_by_type_stream(spark.read.parquet(events_dir))
    streamed = _run_stream(spark, events_dir, hourly_by_type_stream, "hourly_mem")
    max_ts = spark.read.parquet(events_dir).agg(F.max("ts")).first()[0]
    horizon = F.lit(max_ts) - F.expr("INTERVAL 10 MINUTES")
    key = lambda df: sorted(
        (r.hour_start, r.event_type, r.n_events, r.sum_value)
        for r in df.filter(F.col("window_end") <= horizon).collect()
    )
    b, s = key(batch), key(streamed)
    assert b, "expected finalized windows"
    assert b == s


@pytest.mark.slow
def test_sessions_stream_matches_batch(spark, events_dir):
    batch = sessions_stream(spark.read.parquet(events_dir))
    streamed = _run_stream(spark, events_dir, sessions_stream, "sessions_mem")
    max_ts = spark.read.parquet(events_dir).agg(F.max("ts")).first()[0]
    horizon = F.lit(max_ts) - F.expr("INTERVAL 10 MINUTES")
    key = lambda df: sorted(
        (r.user_id, r.session_start, r.n_events)
        for r in df.filter(F.col("window_end") <= horizon).collect()
    )
    b, s = key(batch), key(streamed)
    assert b, "expected finalized sessions"
    assert b == s


@pytest.mark.slow
def test_sliding_stream_matches_batch(spark, events_dir):
    from flink_cep_examples_spark.streaming.analytics import (
        sliding_counts_stream,
    )

    batch = sliding_counts_stream(spark.read.parquet(events_dir))
    streamed = _run_stream(
        spark, events_dir, sliding_counts_stream, "sliding_mem"
    )
    max_ts = spark.read.parquet(events_dir).agg(F.max("ts")).first()[0]
    horizon = F.lit(max_ts) - F.expr("INTERVAL 10 MINUTES")
    key = lambda df: sorted(
        (r.window_start, r.event_type, r.n_events)
        for r in df.filter(F.col("window_end") <= horizon).collect()
    )
    b, s = key(batch), key(streamed)
    assert b, "expected finalized sliding windows"
    assert b == s
    # every event contributes to exactly 4 overlapping windows
    n_events = spark.read.parquet(events_dir).count()
    total = sum(n for _, _, n in key(batch))
    closed_frac = total / (4 * n_events)
    assert 0.5 < closed_frac <= 1.0
