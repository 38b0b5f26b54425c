"""Low-level keyed-process tier tests: golden replication of the
reference's example 4, plus the documented semantic differences from
the CEP tier (SURVEY §2.4: latest-alarm matching, inline expiry)."""

from __future__ import annotations

from flink_cep_examples_spark.operators.keyed_process import (
    AlertReactionProcessor,
    billing_low_level_alerts,
    keyed_process,
)
from flink_cep_examples_spark.sources.billing import billing_from_rows

from tests.fixtures import EXPECTED_MATCHES, GOLDEN_INPUT_ROWS


def _rows(df):
    return sorted(
        (r.id, r.alarmTriggerDatetime, r.topupDatetime) for r in df.collect()
    )


def test_golden_example4(spark):
    """Example 4 on the golden input emits exactly the match (it has no
    timeout side output — FlinkProcessFunctionExample prints matches only)."""
    df = billing_from_rows(spark, GOLDEN_INPUT_ROWS)
    assert _rows(billing_low_level_alerts(df)) == EXPECTED_MATCHES


def test_latest_alarm_wins(spark):
    """Two alarms then a top-up: example-4 state machine matches the
    LATEST alarm (state overwrite, FlinkProcessFunctionExample.scala:67-70),
    unlike the CEP tier which matches the earliest live one."""
    rows = [
        ("5", "2020-05-01 10:00:00", 20, 5),
        ("5", "2020-05-01 10:30:00", 15, 4),
        ("5", "2020-05-01 11:20:00", 4, 90),
    ]
    df = billing_from_rows(spark, rows)
    assert _rows(billing_low_level_alerts(df)) == [
        ("5", "2020-05-01 10:30:00", "2020-05-01 11:20:00")
    ]


def test_exact_one_hour_expiry(spark):
    """Top-up at exactly alarm+1h: inline expiry check uses >= so no
    emission (FlinkProcessFunctionExample.scala:73-77)."""
    rows = [
        ("9", "2020-05-01 10:00:00", 20, 5),
        ("9", "2020-05-01 11:00:00", 3, 50),
    ]
    df = billing_from_rows(spark, rows)
    assert _rows(billing_low_level_alerts(df)) == []


def test_non_alarm_first_no_crash(spark):
    """The reference would NPE when a key's first event is not an alarm
    (null lastModifiedState at :73); our tier guards and proceeds."""
    rows = [
        ("7", "2020-05-01 10:00:00", 5, 50),
        ("7", "2020-05-01 10:10:00", 50, 3),
        ("7", "2020-05-01 10:20:00", 2, 99),
    ]
    df = billing_from_rows(spark, rows)
    assert _rows(billing_low_level_alerts(df)) == [
        ("7", "2020-05-01 10:10:00", "2020-05-01 10:20:00")
    ]


def test_event_time_timers(spark):
    """The timer surface itself (registerEventTimeTimer + on_timer):
    a processor that emits a 'ping' 30 min after every alarm."""

    class TimerProcessor:
        def process_element(self, value, ctx, out):
            if value["balanceBefore"] >= 10 and value["balanceAfter"] < 10:
                ctx.timer_service.register_event_time_timer(
                    ctx.timestamp + 30 * 60 * 1000
                )

        def on_timer(self, ts_ms, ctx, out):
            out.append({"id": ctx.key, "fired_at_ms": ts_ms})

    rows = [
        ("1", "2020-05-01 10:00:00", 20, 5),   # alarm → timer at 10:30
        ("1", "2020-05-01 10:45:00", 5, 4),    # watermark passes 10:30 → fires
        ("2", "2020-05-01 12:00:00", 30, 2),   # alarm → timer fires at end-of-input
    ]
    df = billing_from_rows(spark, rows)
    out = keyed_process(
        df, TimerProcessor, "id string, fired_at_ms long"
    ).collect()
    got = sorted((r.id, r.fired_at_ms) for r in out)
    base_1 = 1588329000000  # 2020-05-01 10:30:00 UTC
    base_2 = 1588336200000  # 2020-05-01 12:30:00 UTC
    assert got == [("1", base_1), ("2", base_2)]
