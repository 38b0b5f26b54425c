"""EXPERIMENTAL — API-contract-tested only, never executed in this
build environment (the tier needs the ``protobuf`` package and the
RocksDB state-store provider, neither present here; see README). The
executed, oracle-gated keyed-process paths are the batch tier
(operators/keyed_process.py) and the ``applyInPandasWithState`` tier
(streaming/keyed_process_stream.py).

Keyed-process tier on Spark 4's ``transformWithStateInPandas`` —
the survey-preferred mapping of Flink's ``KeyedProcessFunction``
(FlinkProcessFunctionExample.scala:44-87): named typed per-key value
states, event-time timers, and an output collector, with state held
natively by the state-store backend (RocksDB) instead of a pickled
blob column.

Relation to :mod:`streaming.keyed_process_stream` (the
``applyInPandasWithState`` tier): identical user surface
(``processor_factory`` classes run unchanged) and identical
buffer-and-sort-on-watermark discipline, so batch, stream, and this
tier agree row-for-row. What this tier changes is the state plumbing:

- the out-of-orderness row buffer is a typed ``ListState`` (columnar
  Arrow transfer + native store, no pickle);
- each declared user state is its own ``ValueState`` with a real
  schema — independently updatable, TTL-able, and visible to the
  state-store as a column family rather than an opaque blob;
- wake-ups for idle keys use the operator's native per-key event-time
  timer service. User-level Flink timers stay in our own ``ListState``
  because the reference semantics interleave timer callbacks *between
  rows* (fire timers < row ts before that row), which a per-batch
  native expiry callback cannot reproduce; the single native timer is
  registered at the earliest pending obligation and merely triggers
  the release pass.

Runtime requirement: ``transformWithStateInPandas`` needs the
``protobuf`` Python package (the state server speaks protobuf) and the
RocksDB state-store provider. This sandbox ships neither protobuf nor
a pip; the module import-guards and raises with a clear message, and
its test skips — on a real Spark 4.1+ cluster it runs as-is.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_cep_examples_spark.operators.keyed_process import Context

_TS_COL = "__kp_ts_ms"

try:  # the tWS python worker needs protobuf; absent in this sandbox
    import google.protobuf  # noqa: F401

    HAVE_TWS_RUNTIME = True
except ImportError:
    HAVE_TWS_RUNTIME = False

#: state-store provider required by transformWithStateInPandas
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


class _TwsValue:
    """Adapter: the batch tier's ValueState surface (value/update/clear)
    over a tWS single-column ValueState."""

    __slots__ = ("_vs",)

    def __init__(self, vs) -> None:
        self._vs = vs

    def value(self):
        if not self._vs.exists():
            return None
        row = self._vs.get()
        return None if row is None else row[0]

    def update(self, v) -> None:
        self._vs.update((v,))

    def clear(self) -> None:
        self._vs.clear()


def _build_processor_cls():
    """Defer the StatefulProcessor subclass construction so importing
    this module never touches the gated runtime."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _KeyedProcessTws(StatefulProcessor):
        def __init__(
            self,
            processor_factory: Callable[[], Any],
            state_schemas: dict[str, str],
            buffer_schema: T.StructType,
            out_cols: list[str],
            ts_idx: int,
            tb_idx: int,
        ) -> None:
            self._factory = processor_factory
            self._state_schemas = state_schemas
            self._buffer_schema = buffer_schema
            self._out_cols = out_cols
            self._ts_idx = ts_idx
            self._tb_idx = tb_idx

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._buffer = handle.getListState("rowbuf", self._buffer_schema)
            self._utimers = handle.getListState("user_timers", "t BIGINT")
            self._states = {
                name: handle.getValueState(f"u_{name}", ddl)
                for name, ddl in self._state_schemas.items()
            }

        # -- shared release pass (same discipline as the pickle tier) --

        def _run(
            self, key: tuple, new_rows: list[tuple], wm_ms: int
        ) -> Iterator[pd.DataFrame]:
            buffer = list(self._buffer.get()) if self._buffer.exists() else []
            buffer.extend(new_rows)

            timers: set[int] = (
                {t[0] for t in self._utimers.get()}
                if self._utimers.exists()
                else set()
            )
            ctx = Context(key if len(key) > 1 else key[0])
            ctx._states = {
                n: _TwsValue(vs) for n, vs in self._states.items()
            }
            ctx.timer_service._timers = timers
            proc = self._factory()
            on_timer = getattr(proc, "on_timer", None)
            out: list[dict] = []
            cols = [f.name for f in self._buffer_schema.fields]

            def fire_due(upto_exclusive: int) -> None:
                if on_timer is None:
                    return
                for t in sorted(x for x in set(timers) if x < upto_exclusive):
                    timers.discard(t)
                    ctx.timestamp = t
                    on_timer(t, ctx, out)

            ti, bi = self._ts_idx, self._tb_idx
            buffer.sort(key=lambda r: (r[ti], r[bi]))
            release = [r for r in buffer if r[ti] <= wm_ms]
            keep = [r for r in buffer if r[ti] > wm_ms]
            for row in release:
                rec = dict(zip(cols, row))
                ts = rec.pop(_TS_COL)
                fire_due(ts)
                ctx.timestamp = ts
                proc.process_element(rec, ctx, out)
            # watermark passes timers at/below it
            fire_due(wm_ms + 1)

            # persist typed state
            if keep:
                self._buffer.put(keep)
            else:
                self._buffer.clear()
            if timers:
                self._utimers.put([(t,) for t in sorted(timers)])
            else:
                self._utimers.clear()

            # next obligation → single native wake-up timer
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            pending = [r[ti] for r in keep] + list(timers)
            if pending:
                self._handle.registerTimer(max(min(pending), wm_ms + 1))

            if out:
                yield pd.DataFrame(
                    {c: [row.get(c) for row in out] for c in self._out_cols},
                    columns=self._out_cols,
                )

        def handleInputRows(self, key, rows, timerValues):
            wm_ms = timerValues.getCurrentWatermarkInMs()
            new_rows: list[tuple] = []
            ti = self._ts_idx
            for pdf in rows:
                for row in pdf.itertuples(index=False, name=None):
                    if row[ti] >= wm_ms:  # late beyond watermark: dropped
                        new_rows.append(row)
            yield from self._run(tuple(key), new_rows, wm_ms)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            yield from self._run(
                tuple(key), [], timerValues.getCurrentWatermarkInMs()
            )

        def close(self) -> None:
            pass

    return _KeyedProcessTws


def keyed_process_tws(
    df: DataFrame,
    processor_factory: Callable[[], Any],
    output_schema: T.StructType | str,
    state_schemas: dict[str, str],
    key_cols: tuple[str, ...] = ("id",),
    order_col: str = "event_time",
    tiebreak_col: str = "seq",
    watermark_delay: str = "6 minutes",
) -> DataFrame:
    """``transformWithStateInPandas`` twin of
    :func:`streaming.keyed_process_stream.keyed_process_stream`.

    ``state_schemas`` declares each named user state's single-column
    DDL (e.g. ``{"alerted": "v BOOLEAN"}``) so the backend can store it
    natively; states the processor touches without declaring still
    work but live only within one release pass (don't persist).

    The session must run the RocksDB state-store provider::

        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                       ROCKSDB_PROVIDER)
    """
    if not HAVE_TWS_RUNTIME:
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(pyspark's state-server protocol); not available in this "
            "environment. Use keyed_process_stream (applyInPandasWithState) "
            "instead — same semantics, pickled state."
        )
    if isinstance(output_schema, str):
        output_schema = T.StructType.fromDDL(output_schema)
    out_cols = [f.name for f in output_schema.fields]

    prepared = df.withColumn(
        order_col, F.col(order_col).cast(T.TimestampType())
    ).withWatermark(order_col, watermark_delay)
    prepared = prepared.withColumn(
        _TS_COL, (F.unix_micros(order_col) / 1000).cast("long")
    )
    # buffer rows: every input column except the (non-Arrow-friendly)
    # event-time timestamp itself, which the processor sees as epoch-ms
    buffer_cols = [c for c in prepared.columns if c != order_col]
    buffer_schema = T.StructType(
        [prepared.schema[c] for c in buffer_cols]
    )
    ts_idx = buffer_cols.index(_TS_COL)
    tb_idx = buffer_cols.index(tiebreak_col)

    cls = _build_processor_cls()
    return (
        prepared.select(*buffer_cols)
        .groupBy(*list(key_cols))
        .transformWithStateInPandas(
            cls(
                processor_factory,
                state_schemas,
                buffer_schema,
                out_cols,
                ts_idx,
                tb_idx,
            ),
            outputStructType=output_schema,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


def billing_low_level_alerts_tws(
    df: DataFrame, watermark_delay: str = "6 minutes"
) -> DataFrame:
    """Example-4 on the tWS tier: same AlertReactionProcessor instance
    as batch/stream, with its three states declared for native storage
    (FlinkProcessFunctionExample.scala:46-53's three
    ValueStateDescriptors, 1:1)."""
    from flink_cep_examples_spark.operators.keyed_process import (
        AlertReactionProcessor,
    )
    from flink_cep_examples_spark.schemas import ALERT_REACTION_SCHEMA

    return keyed_process_tws(
        df,
        AlertReactionProcessor,
        ALERT_REACTION_SCHEMA,
        state_schemas={
            "last_modified_state": "v BIGINT",
            "alarm_trigger_datetime": "v STRING",
            "alerted": "v BOOLEAN",
        },
        watermark_delay=watermark_delay,
    )
