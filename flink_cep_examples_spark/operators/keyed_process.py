"""Low-level keyed stateful processing tier (batch).

The public surface users get when they outgrow the Pattern DSL — the
same per-key state + event-time-timer model the reference's example 4
exposes via Flink's ``KeyedProcessFunction``
(FlinkProcessFunctionExample.scala:44-87):

- named, typed, per-key mutable value states
  (``ValueStateDescriptor`` ×3 at :46-53 → :class:`ValueState`);
- per-element callback with the element's event timestamp
  (``ctx.timestamp``, :61,73);
- event-time timers (``ctx.timerService.registerEventTimeTimer``, :71);
- an output collector (``Collector.collect``, :81).

Batch semantics: rows are processed per key in event-time order (the
total order makes the watermark implicitly complete), timers with
``ts < current row ts`` fire before the row is processed, and all
remaining timers fire at end-of-input (watermark → ∞). The streaming
tier (streaming/keyed_process_stream.py) runs the same processor class
under ``applyInPandasWithState``.

This is deliberately the slow path — per-row Python — for imperative
logic that genuinely can't be expressed declaratively; everything else
belongs in DataFrame ops or the CEP operator.
"""

from __future__ import annotations

from typing import Any, Callable, Protocol

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TS_COL = "__kp_ts_ms"


class ValueState:
    """Named per-key mutable state slot (Flink ValueState 1:1:
    ``value()`` / ``update(v)`` / ``clear()``; null-as-uninitialized)."""

    __slots__ = ("_v",)

    def __init__(self) -> None:
        self._v = None

    def value(self):
        return self._v

    def update(self, v) -> None:
        self._v = v

    def clear(self) -> None:
        self._v = None


class TimerService:
    """Event-time timers. Registrations are deduplicated per timestamp
    (Flink semantics: one timer per key per timestamp)."""

    __slots__ = ("_timers",)

    def __init__(self) -> None:
        self._timers: set[int] = set()

    def register_event_time_timer(self, ts_ms: int) -> None:
        self._timers.add(int(ts_ms))

    def delete_event_time_timer(self, ts_ms: int) -> None:
        self._timers.discard(int(ts_ms))


class Context:
    """Per-element context: current key, element event-time (epoch ms,
    matching the reference's millisecond arithmetic,
    FlinkProcessFunctionExample.scala:22,71), state access, timers."""

    __slots__ = ("key", "timestamp", "timer_service", "_states")

    def __init__(self, key) -> None:
        self.key = key
        self.timestamp: int | None = None
        self.timer_service = TimerService()
        self._states: dict[str, ValueState] = {}

    def state(self, name: str) -> ValueState:
        if name not in self._states:
            self._states[name] = ValueState()
        return self._states[name]


class KeyedProcessor(Protocol):
    def process_element(self, value: dict, ctx: Context, out: list) -> None: ...

    # optional: def on_timer(self, ts_ms: int, ctx: Context, out: list) -> None


def keyed_process(
    df: DataFrame,
    processor_factory: Callable[[], Any],
    output_schema: T.StructType | str,
    key_cols: tuple[str, ...] = ("id",),
    order_col: str = "event_time",
    tiebreak_col: str = "seq",
) -> DataFrame:
    """Run a keyed processor over each key group in event-time order.

    ``processor_factory`` builds a fresh processor per key (state is
    per-key, as in Flink). Output rows are dicts matching
    ``output_schema``.
    """
    if isinstance(output_schema, str):
        output_schema = T.StructType.fromDDL(output_schema)
    key_list = list(key_cols)

    prepared = df.withColumn(
        _TS_COL, (F.unix_micros(F.col(order_col).cast(T.TimestampType())) / 1000).cast("long")
    )
    out_cols = [f.name for f in output_schema.fields]

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([_TS_COL, tiebreak_col], kind="mergesort")
        key = tuple(pdf[k].iloc[0] for k in key_list)
        ctx = Context(key if len(key) > 1 else key[0])
        proc = processor_factory()
        on_timer = getattr(proc, "on_timer", None)
        out: list[dict] = []
        records = pdf.to_dict("records")
        for rec in records:
            ts = rec.pop(_TS_COL)
            # fire due timers: event time has passed them
            if on_timer is not None and ctx.timer_service._timers:
                due = sorted(t for t in ctx.timer_service._timers if t < ts)
                for t in due:
                    ctx.timer_service._timers.discard(t)
                    ctx.timestamp = t
                    on_timer(t, ctx, out)
            ctx.timestamp = ts
            proc.process_element(rec, ctx, out)
        # end of input = watermark → ∞: fire everything left
        if on_timer is not None:
            for t in sorted(ctx.timer_service._timers):
                ctx.timestamp = t
                on_timer(t, ctx, out)
            ctx.timer_service._timers.clear()
        return pd.DataFrame(
            {c: [row.get(c) for row in out] for c in out_cols}, columns=out_cols
        )

    from flink_cep_examples_spark.operators.partition_scan import (
        grouped_partition_scan,
    )

    return grouped_partition_scan(
        prepared, key_list, [_TS_COL, tiebreak_col], run_group, output_schema
    )


# ---------------------------------------------------------------------------
# The reference's example-4 processor, re-expressed on this tier
# ---------------------------------------------------------------------------


class AlertReactionProcessor:
    """Re-implementation (from observable semantics, not a copy) of the
    hand-rolled alert state machine in
    FlinkProcessFunctionExample.scala:55-86:

    - on an alarm row (balanceBefore >= 10 and balanceAfter < 10):
      record last-modified := element ts, alerted := true, remember the
      alarm datetime (:67-71; the registered timer at :71 is dead code —
      onTimer is never overridden — so expiry is enforced inline, which
      is what we replicate);
    - if the element ts is >= last alarm ts + 1h: expire the alert
      (:73-77, note ``>=``: a top-up at exactly +1h does NOT emit);
    - on a top-up row (balanceBefore < balanceAfter) while alerted:
      emit (id, alarmTriggerDatetime, datetime) and reset (:78-85).

    Fidelity notes (deliberate): unlike the CEP tier this matches the
    *latest* alarm before a top-up (each alarm overwrites state), never
    validates B rows, and emits no timeout output. One guard added: the
    reference null-derefs ``lastModifiedState`` when a key's first event
    is not an alarm (:73 with state still null); we skip the expiry
    check until state exists instead of crashing.
    """

    WITHIN_MS = 3_600_000  # FlinkProcessFunctionExample.scala:22

    def process_element(self, value: dict, ctx: Context, out: list) -> None:
        last_modified = ctx.state("last_modified_state")
        alarm_dt = ctx.state("alarm_trigger_datetime")
        alerted = ctx.state("alerted")

        if value["balanceBefore"] >= 10 and value["balanceAfter"] < 10:
            last_modified.update(ctx.timestamp)
            alerted.update(True)
            alarm_dt.update(value["datetime"])
        if (
            last_modified.value() is not None
            and ctx.timestamp >= last_modified.value() + self.WITHIN_MS
        ):
            alerted.update(False)
            alarm_dt.update("")
        if value["balanceBefore"] < value["balanceAfter"] and alerted.value():
            last_modified.update(ctx.timestamp)
            out.append(
                {
                    "id": value["id"],
                    "alarmTriggerDatetime": alarm_dt.value(),
                    "topupDatetime": value["datetime"],
                }
            )
            alerted.update(False)
            alarm_dt.update("")


def billing_low_level_alerts(df: DataFrame) -> DataFrame:
    """Example-4 as a query: alert reactions via the low-level tier."""
    from flink_cep_examples_spark.schemas import ALERT_REACTION_SCHEMA

    return keyed_process(df, AlertReactionProcessor, ALERT_REACTION_SCHEMA)
