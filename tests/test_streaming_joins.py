"""Stream-stream interval join: the streaming result (file source,
append mode) must equal the batch result of the SAME operator — inner
joins emit on match, so no horizon filtering is needed; the watermark
only bounds state."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_cep_examples_spark.sources.tables import load_table
from flink_cep_examples_spark.streaming.joins import interval_join_stream


def _sides(df):
    clicks = df.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    purchases = df.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    return clicks, purchases


def _join(clicks, purchases):
    return interval_join_stream(
        clicks,
        purchases,
        on="user_id",
        left_time="click_ts",
        right_time="purchase_ts",
        lower_seconds=0,
        upper_seconds=1800,
    ).select("click_id", "purchase_id", "user_id")


@pytest.mark.slow
def test_interval_join_stream_matches_batch(spark, sf_small, tmp_path):
    src = str(tmp_path / "events")
    load_table(spark, sf_small, "events").coalesce(2).write.parquet(src)

    batch = _join(*_sides(spark.read.parquet(src)))
    b = sorted(map(tuple, batch.collect()))
    assert b, "expected funnel pairs in the fixture"

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = _join(*_sides(stream))
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ij_mem")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    s = sorted(map(tuple, spark.table("ij_mem").collect()))
    assert b == s


def test_interval_join_requires_distinct_time_names(spark):
    df = spark.range(1).select(
        F.col("id").alias("k"), F.current_timestamp().alias("ts")
    )
    with pytest.raises(ValueError):
        interval_join_stream(
            df, df, on="k", left_time="ts", right_time="ts",
            lower_seconds=0, upper_seconds=1,
        )


def test_interval_join_bounds_inclusive(spark):
    rows_l = [(1, "2024-01-01 00:00:00")]
    rows_r = [
        (1, "2024-01-01 00:00:00"),  # delta 0  -> in (lower inclusive)
        (1, "2024-01-01 00:30:00"),  # delta 1800 -> in (upper inclusive)
        (1, "2024-01-01 00:30:01"),  # delta 1801 -> out
        (2, "2024-01-01 00:00:01"),  # wrong key -> out
    ]
    left = spark.createDataFrame(rows_l, "k int, lt string").select(
        "k", F.to_timestamp("lt").alias("lt")
    )
    right = spark.createDataFrame(rows_r, "k int, rt string").select(
        "k", F.to_timestamp("rt").alias("rt")
    )
    out = interval_join_stream(
        left, right, on="k", left_time="lt", right_time="rt",
        lower_seconds=0, upper_seconds=1800,
    )
    got = sorted(r.rt.strftime("%H:%M:%S") for r in out.collect())
    assert got == ["00:00:00", "00:30:00"]


def test_left_outer_interval_join_batch_nulls(spark):
    rows_l = [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 06:00:00")]
    rows_r = [(1, "2024-01-01 00:10:00")]
    left = spark.createDataFrame(rows_l, "k int, lt string").select(
        "k", F.to_timestamp("lt").alias("lt")
    )
    right = spark.createDataFrame(rows_r, "k int, rt string").select(
        "k", F.to_timestamp("rt").alias("rt")
    )
    out = interval_join_stream(
        left, right, on="k", left_time="lt", right_time="rt",
        lower_seconds=0, upper_seconds=1800, how="left_outer",
    ).collect()
    by_lt = {r.lt.strftime("%H"): r.rt for r in out}
    assert by_lt["00"] is not None and by_lt["06"] is None


@pytest.mark.slow
def test_left_outer_interval_join_stream_matches_batch(
    spark, sf_small, tmp_path
):
    """Stream/batch agreement for the outer variant, restricted to the
    closed horizon (left rows whose no-more-matches proof arrived
    before the replay ended)."""
    src = str(tmp_path / "events_lo")
    load_table(spark, sf_small, "events").coalesce(2).write.parquet(src)

    def join_lo(df):
        return interval_join_stream(
            *_sides(df), on="user_id", left_time="click_ts",
            right_time="purchase_ts", lower_seconds=0, upper_seconds=1800,
            how="left_outer",
        ).select("click_id", "purchase_id", "click_ts")

    batch_df = join_lo(spark.read.parquet(src))
    # The global watermark is the MIN over both sides' watermarks
    # (each side's max event time - delay), so the closed horizon for
    # outer emission derives from the smaller side max; subtract the
    # join upper bound plus a 1-minute guard band (ms-truncated,
    # per-batch-advancing watermark).
    ev = spark.read.parquet(src)
    max_click = ev.filter(F.col("event_type") == "click").agg(
        F.max("ts")
    ).first()[0]
    max_purchase = ev.filter(F.col("event_type") == "purchase").agg(
        F.max("ts")
    ).first()[0]
    horizon = (
        F.lit(min(max_click, max_purchase))
        - F.expr("INTERVAL 10 MINUTES")
        - F.expr("INTERVAL 1800 SECONDS")
        - F.expr("INTERVAL 1 MINUTES")
    )
    trim = lambda df: sorted(
        (r.click_id, r.purchase_id)
        for r in df.filter(F.col("click_ts") <= horizon).collect()
    )

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        join_lo(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ij_lo_mem")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    b, s = trim(batch_df), trim(spark.table("ij_lo_mem"))
    assert b, "expected rows inside the closed horizon"
    assert any(p is None for _, p in b), "expected unmatched clicks"
    assert b == s
