"""Streaming CEP operator (Structured Streaming).

The same NFA core as batch, run under
``groupBy(key).applyInPandasWithState(...)`` with event-time timeouts —
the Spark-idiomatic equivalent of Flink's CepOperator on a keyed stream
(CEP.pattern(keyedStream, pattern), FlinkCEPExample.scala:76):

- **watermark**: ``withWatermark(order_col, delay)`` reproduces the
  reference's bounded-out-of-orderness assigner
  (``currentMaxTimestamp - maxOutOfOrderness``,
  FlinkCEPExample.scala:27-42) — same model, computed per micro-batch.
- **buffer-and-sort-on-watermark**: Flink's CepOperator buffers events
  per key and advances the NFA in event-time order as the watermark
  passes them; here that buffer lives in the group state, and each
  invocation releases buffered rows ≤ watermark, sorted by
  (event-time, tiebreak), into the NFA (SURVEY §1.5 "load-bearing").
  Rows older than the watermark at arrival are dropped (Flink CEP
  drops late events the same way; documented).
- **within / absence timeouts**: the state's event-time timeout is set
  to the earliest pending obligation — a partial's deadline or a
  buffered row's release time — so a key with no new data still emits
  its absence alert when the watermark passes the deadline
  (TimedOutPartialMatchHandler,
  FlinkCEPAbsenceOfEventExample.scala:79,93-103). Spark's no-data
  micro-batches (on by default) advance the watermark to fire these.
- **side outputs**: match + timeout rows share one schema with a
  ``tag`` column (no OutputTag in Structured Streaming; SURVEY §2.3).

State per key = (event buffer beyond the watermark) + (open partial
matches within the ``within`` horizon) — both bounded by the
watermark-delay / within horizons, so state size is O(events per key
per horizon), not O(stream length). Predicates are evaluated
vectorized in Spark SQL before the shuffle, exactly as in batch.

``transformWithStateInPandas`` (Spark 4.x) could replace
``applyInPandasWithState`` here 1:1 (ValueState handles + native
timers); we stay on the older API because it runs on the default HDFS
state store without extra RocksDB configuration.
"""

from __future__ import annotations

import pickle
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from flink_cep_examples_spark.operators.cep_batch import output_schema
from flink_cep_examples_spark.operators.nfa import Nfa, NfaState
from flink_cep_examples_spark.plans.pattern import PatternSpec
from flink_cep_examples_spark.schemas import MATCH_TAG, TIMEOUT_TAG

_PRED_PREFIX = "__cep_p_"
_TS_COL = "__cep_ts_us"

#: state: one pickled blob = (buffer: list[row tuple], NfaState)
_STATE_SCHEMA = T.StructType([T.StructField("blob", T.BinaryType(), True)])


def _prepare_stream(df: DataFrame, spec: PatternSpec) -> DataFrame:
    needed = {m.src for m in spec.measures if m.fn != "count"}
    needed.update(spec.key_cols)
    needed.add(spec.tiebreak_col)
    needed.add(spec.order_col)  # kept for the watermark; in `needed` so a
    # measure over the event-time column doesn't select it twice
    cols = [F.col(c) for c in sorted(needed)]
    cols.append(F.unix_micros(F.col(spec.order_col).cast("timestamp")).alias(_TS_COL))
    for i, v in enumerate(spec.variables):
        cols.append(F.expr(v.predicate).alias(f"{_PRED_PREFIX}{i}"))
    return df.select(*cols)


def match_pattern_stream(
    df: DataFrame,
    spec: PatternSpec,
    watermark_delay: str = "6 minutes",
) -> DataFrame:
    """Streaming row-pattern recognition. ``df`` must be a streaming
    DataFrame containing ``spec.order_col`` as a timestamp column.
    Default watermark delay mirrors the reference's 6-minute
    out-of-orderness (FlinkCEPExample.scala:28). Output: append-mode
    stream with keys + measures + ``tag``."""
    spec.validate()
    out_schema = output_schema(df, spec)
    prepared = _prepare_stream(df, spec).withWatermark(
        spec.order_col, watermark_delay
    )

    n_vars = len(spec.variables)
    key_cols = list(spec.key_cols)
    measures = list(spec.measures)
    tiebreak = spec.tiebreak_col
    # per-variable tuple of srcs that variable must remember
    var_srcs: dict[str, list[str]] = {
        v.name: sorted(
            {m.src for m in measures if m.var == v.name and m.fn != "count"}
        )
        for v in spec.variables
    }
    all_srcs = sorted({s for srcs in var_srcs.values() for s in srcs})
    pred_cols = [f"{_PRED_PREFIX}{i}" for i in range(n_vars)]
    out_names = [f.name for f in out_schema.fields]

    def emit_rows(key, results: list[tuple[dict, str]]) -> pd.DataFrame:
        data: dict[str, list] = {c: [] for c in out_names}
        for match, tag in results:
            for k, kv in zip(key_cols, key):
                data[k].append(kv)
            for m in measures:
                span = match.get(m.var)
                if span is None:
                    data[m.name].append(0 if m.fn == "count" else m.default)
                elif m.fn == "count":
                    data[m.name].append(span[2])
                else:
                    payload = span[0] if m.fn == "first" else span[1]
                    data[m.name].append(payload[all_srcs.index(m.src)])
            data["tag"].append(tag)
        return pd.DataFrame(data, columns=out_names)

    # one compiled NFA shared by every key group on the worker (it is
    # key-stateless: per-key state lives in NfaState) — ~10k groups per
    # micro-batch would otherwise recompile it 10k times.
    nfa = Nfa(spec)

    def process(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            buffer, nst = pickle.loads(state.get[0])
        else:
            buffer, nst = [], NfaState()

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_arr = pdf[_TS_COL].to_numpy()
                tb_arr = pdf[tiebreak].to_numpy()
                pred_arr = pdf[pred_cols].to_numpy(dtype=bool)
                src_arr = pdf[all_srcs].to_numpy() if all_srcs else None
                for i in range(len(pdf)):
                    t = int(ts_arr[i])
                    if t < wm_us:
                        continue  # late beyond watermark: dropped (as Flink CEP)
                    payload = (
                        tuple(src_arr[i]) if src_arr is not None else ()
                    )
                    buffer.append(
                        (t, tb_arr[i], tuple(bool(b) for b in pred_arr[i]), payload)
                    )

        results: list[tuple[dict, str]] = []
        # release buffered rows the watermark has passed, in event-time order
        buffer.sort(key=lambda r: (r[0], r[1]))
        release = [r for r in buffer if r[0] <= wm_us]
        buffer = [r for r in buffer if r[0] > wm_us]
        for t, _tb, preds, payload in release:
            m, to = nfa.step(nst, t, preds, payload)
            results.extend((x, MATCH_TAG) for x in m)
            results.extend((x, TIMEOUT_TAG) for x in to)
        # the watermark itself may expire partials (absence alerts) or
        # confirm pending timed-absence completions (matches)
        wm_matches, wm_timeouts = nfa.advance_time(nst, wm_us)
        results.extend((x, MATCH_TAG) for x in wm_matches)
        results.extend((x, TIMEOUT_TAG) for x in wm_timeouts)

        # next obligation: earliest buffered release or partial deadline
        pending: list[int] = [r[0] for r in buffer]
        if nfa.within_us is not None:
            pending += [run.start_ts + nfa.within_us for run in nst.runs]
        if not buffer and not nst.runs:
            state.remove()
        else:
            state.update((pickle.dumps((buffer, nst)),))
            if pending:
                state.setTimeoutTimestamp(max(min(pending) // 1000, state.getCurrentWatermarkMs() + 1))
        if results:
            yield emit_rows(key, results)

    return prepared.groupBy(*key_cols).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
