"""Streaming distinct-count sketch: HyperLogLog registers in the
Structured-Streaming state store.

The batch HLL (queries/sampling.py::events_hll_distinct) aggregates
max-rho per (key, bucket) over a bounded table; this operator keeps
the SAME m-register array as per-key state and folds each micro-batch
into it — the mergeable-sketch property (state' = bucket-wise MAX)
doing exactly what it promises. Every micro-batch that touches a key
emits one row with the key's RUNNING estimate (append mode carries an
``updates`` counter so a consumer — and the agreement test — can pick
each key's latest row).

Bit parity with batch is by construction, not coincidence: the
(bucket, rho) projection is the shared Spark expression
(queries/sampling.py::hll_bucket_rho_cols — evaluated scan-side,
vectorized, BEFORE the shuffle), and finalization goes through the
shared queries/sampling.py::hll_estimate (scaled-BIGINT harmonic sum,
the one shared alpha literal, the shared linear-counting table), so
the final streamed estimate equals the batch query's bit-for-bit
(pinned by tests/test_streaming_sketch.py).

Scale design: state is EXACTLY m bytes per key (m=256 registers, each
holding a 1..25 rank) — the O(types × m) bound that makes the sketch
usable where streaming COUNT(DISTINCT) state (every distinct key,
unbounded) is not; registers survive checkpoint restart as plain
bytes. No timeout: a register file never expires (restartable
lifetime aggregation); callers wanting windowed distincts bucket the
key by window start.

Reference parity: extends the reference's streaming tier
(FlinkCEPExample.scala's keyed stream processing) with the sketch
state a Flink user would build in a KeyedProcessFunction ValueState —
here via applyInPandasWithState on the same bucketed-state pattern as
streaming/cep_stream.py.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_cep_examples_spark.queries.sampling import (
    _HLL_M,
    hll_bucket_rho_cols,
    hll_estimate,
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("updates", T.LongType(), False),
        T.StructField("n_zero", T.LongType(), False),
        T.StructField("denom_q", T.LongType(), False),
        T.StructField("est_distinct", T.DoubleType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("regs", T.BinaryType(), True),
        T.StructField("updates", T.LongType(), True),
    ]
)


def hll_distinct_stream(df: DataFrame, key_col: str = "event_type",
                        id_col: str = "user_id") -> DataFrame:
    """``df`` is a streaming DataFrame with ``key_col`` and
    ``id_col``; returns an append-mode stream of running HLL
    distinct-``id_col`` estimates per key."""
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    projected = df.select(
        F.col(key_col).alias("event_type"), *hll_bucket_rho_cols(id_col)
    )

    def fold(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            regs_b, updates = state.get
            regs = np.frombuffer(regs_b, dtype=np.uint8).copy()
        else:
            regs, updates = np.zeros(_HLL_M, dtype=np.uint8), 0
        touched = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            touched = True
            # bucket-wise MAX fold of the micro-batch into the
            # registers: one vectorized pass, no per-row Python
            np.maximum.at(
                regs,
                pdf["bucket"].to_numpy(dtype=np.int64),
                pdf["rho"].to_numpy(dtype=np.uint8),
            )
        if not touched:
            return
        updates += 1
        state.update((regs.tobytes(), updates))
        n_zero, denom_q, est = hll_estimate(regs)
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "updates": [updates],
                "n_zero": [n_zero],
                "denom_q": [denom_q],
                "est_distinct": [est],
            }
        )

    return projected.groupBy("event_type").applyInPandasWithState(
        fold,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
