"""Streaming keyed-process tier: the example-4 processor run under
Structured Streaming must agree with the batch tier on the golden
input, including a timer-driven processor to exercise on_timer across
watermark advances."""

from __future__ import annotations

import pytest

from flink_cep_examples_spark.operators.keyed_process import (
    AlertReactionProcessor,
    keyed_process,
)
from flink_cep_examples_spark.schemas import ALERT_REACTION_SCHEMA
from flink_cep_examples_spark.sources.billing import (
    billing_from_rows,
    read_billing_csv_stream,
)
from flink_cep_examples_spark.streaming.keyed_process_stream import (
    keyed_process_stream,
)

from tests.fixtures import EXPECTED_MATCHES, GOLDEN_INPUT_CSV, GOLDEN_INPUT_ROWS


def _run_stream(spark, tmp_path, factory, schema, name, **kw):
    src = tmp_path / "in"
    src.mkdir()
    (src / "batch1.csv").write_text(GOLDEN_INPUT_CSV)
    stream = read_billing_csv_stream(spark, str(src))
    out = keyed_process_stream(stream, factory, schema, **kw)
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
def test_streaming_matches_batch_golden(spark, tmp_path):
    got = _run_stream(
        spark,
        tmp_path,
        AlertReactionProcessor,
        ALERT_REACTION_SCHEMA,
        "kp_stream_golden",
        watermark_delay="0 seconds",
    )
    streamed = sorted(
        (r.id, r.alarmTriggerDatetime, r.topupDatetime) for r in got.collect()
    )
    batch = sorted(
        (r.id, r.alarmTriggerDatetime, r.topupDatetime)
        for r in keyed_process(
            billing_from_rows(spark, GOLDEN_INPUT_ROWS),
            AlertReactionProcessor,
            ALERT_REACTION_SCHEMA,
        ).collect()
    )
    assert streamed == batch == EXPECTED_MATCHES


@pytest.mark.slow
def test_streaming_timers_fire_like_batch(spark, tmp_path):
    # defined in function scope so cloudpickle ships it by value (the
    # pytest test module is not importable on executors)
    class CountdownProcessor:
        """Registers a timer 30 min after each element; on_timer emits
        the key + timer ts — exercises watermark-driven firing."""

        def process_element(self, value, ctx, out):
            ctx.timer_service.register_event_time_timer(
                ctx.timestamp + 1_800_000
            )

        def on_timer(self, ts_ms, ctx, out):
            out.append({"id": ctx.key, "fired_at_ms": ts_ms})

    schema = "id string, fired_at_ms long"
    got = _run_stream(
        spark,
        tmp_path,
        CountdownProcessor,
        schema,
        "kp_stream_timers",
        watermark_delay="0 seconds",
    )
    streamed = sorted((r.id, r.fired_at_ms) for r in got.collect())
    batch = sorted(
        (r.id, r.fired_at_ms)
        for r in keyed_process(
            billing_from_rows(spark, GOLDEN_INPUT_ROWS),
            CountdownProcessor,
            schema,
        ).collect()
    )
    # streaming can only fire timers the final watermark (= max event
    # time) has passed; batch end-of-input fires ALL timers — so the
    # streamed set is a non-empty prefix of the batch set.
    assert streamed, "expected watermark-passed timers to fire"
    assert set(streamed) <= set(batch)
