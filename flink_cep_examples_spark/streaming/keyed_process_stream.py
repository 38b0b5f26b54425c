"""Streaming keyed-process tier: the batch :mod:`operators.keyed_process`
surface (named value states + event-time timers + collector) under
Structured Streaming — the ``KeyedProcessFunction`` mapping of
SURVEY §2.4 completed for streams.

Mechanics (same buffer-and-sort-on-watermark discipline as the
streaming CEP operator):

- arriving rows buffer in the group state; rows already older than the
  watermark are dropped (bounded out-of-orderness contract);
- each micro-batch releases buffered rows ≤ watermark to the processor
  in (event-time, tiebreak) order, firing due timers (< row ts) before
  each row, exactly like the batch tier — so batch and streaming runs
  of the same processor agree;
- the watermark itself fires any timers it has passed, and the state
  timeout is set to the earliest pending obligation (next timer or
  buffered row), so an idle key still gets its timer callbacks
  (Spark's no-data micro-batches advance the watermark);
- processor state (the named ValueStates), the row buffer, and pending
  timers pickle into one state column between micro-batches.
"""

from __future__ import annotations

import pickle
from typing import Any, Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from flink_cep_examples_spark.operators.keyed_process import Context

_TS_COL = "__kp_ts_ms"
_STATE_SCHEMA = T.StructType([T.StructField("blob", T.BinaryType())])


def keyed_process_stream(
    df: DataFrame,
    processor_factory: Callable[[], Any],
    output_schema: T.StructType | str,
    key_cols: tuple[str, ...] = ("id",),
    order_col: str = "event_time",
    tiebreak_col: str = "seq",
    watermark_delay: str = "6 minutes",
) -> DataFrame:
    """Streaming twin of :func:`operators.keyed_process.keyed_process`.
    ``df`` must be a streaming DataFrame with ``order_col`` castable to
    timestamp. Returns an append-mode stream of ``output_schema`` rows."""
    if isinstance(output_schema, str):
        output_schema = T.StructType.fromDDL(output_schema)
    key_list = list(key_cols)
    out_cols = [f.name for f in output_schema.fields]

    prepared = df.withColumn(
        order_col, F.col(order_col).cast(T.TimestampType())
    ).withWatermark(order_col, watermark_delay)
    prepared = prepared.withColumn(
        _TS_COL, (F.unix_micros(order_col) / 1000).cast("long")
    )
    data_cols = [c for c in prepared.columns if c not in (_TS_COL,)]

    def process(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        wm_ms = state.getCurrentWatermarkMs()
        if state.exists:
            buffer, states, timers = pickle.loads(state.get[0])
        else:
            buffer, states, timers = [], {}, set()

        ctx = Context(key if len(key) > 1 else key[0])
        ctx._states = states
        ctx.timer_service._timers = timers
        proc = processor_factory()
        on_timer = getattr(proc, "on_timer", None)
        out: list[dict] = []

        if not state.hasTimedOut:
            for pdf in pdfs:
                for rec in pdf.to_dict("records"):
                    ts = rec.pop(_TS_COL)
                    if ts < wm_ms:
                        continue  # late beyond watermark: dropped
                    buffer.append((ts, rec.get(tiebreak_col), rec))

        def fire_due(upto_exclusive: int) -> None:
            if on_timer is None:
                return
            for t in sorted(x for x in set(timers) if x < upto_exclusive):
                timers.discard(t)
                ctx.timestamp = t
                on_timer(t, ctx, out)

        buffer.sort(key=lambda r: (r[0], r[1]))
        release = [r for r in buffer if r[0] <= wm_ms]
        buffer = [r for r in buffer if r[0] > wm_ms]
        for ts, _tb, rec in release:
            fire_due(ts)
            ctx.timestamp = ts
            proc.process_element(rec, ctx, out)
        # the watermark passes timers at/below it (watermark semantics:
        # event time has reached wm, so timers t <= wm have fired)
        fire_due(wm_ms + 1)

        pending = [r[0] for r in buffer] + list(timers)
        if not buffer and not timers and not any(
            s.value() is not None for s in states.values()
        ):
            state.remove()
        else:
            state.update((pickle.dumps((buffer, states, timers)),))
            if pending:
                state.setTimeoutTimestamp(max(min(pending), wm_ms + 1))
        if out:
            yield pd.DataFrame(
                {c: [row.get(c) for row in out] for c in out_cols},
                columns=out_cols,
            )

    return (
        prepared.select(*data_cols, _TS_COL)
        .groupBy(*key_list)
        .applyInPandasWithState(
            process,
            outputStructType=output_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
