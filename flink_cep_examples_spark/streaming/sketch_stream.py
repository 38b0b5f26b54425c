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


# ---------------------------------------------------------------------------
# Streaming count-min sketch (round 7): the FREQUENCY member of the
# sketch trio gets its streaming twin (HLL above = cardinality).
# ---------------------------------------------------------------------------

_CMS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("updates", T.LongType(), False),
        T.StructField("est_cnt", T.LongType(), False),
    ]
)

_CMS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("counters", T.BinaryType(), True),
        T.StructField("updates", T.LongType(), True),
    ]
)


def cms_frequency_stream(
    df: DataFrame,
    probe_ids: list[int],
    key_col: str = "event_type",
    id_col: str = "user_id",
) -> DataFrame:
    """Streaming count-min frequency monitor: per ``key_col``, the
    d×w counter matrix (queries/sampling.py::events_cms_heavy_hitters
    geometry — 4×256 int64, 8 KB) rides the state store and each
    micro-batch folds in by SUM (``np.add.at`` — one vectorized pass,
    the counter-merge property the batch docstring promises doing real
    work). After every fold the stream emits the RUNNING estimate
    ``min_d counter[d][h_d(u)]`` for each of the caller's
    ``probe_ids`` (the "watch these users' frequencies live" shape);
    append mode with an ``updates`` ordinal so consumers pick the
    latest row per (key, user).

    Bit parity with batch by construction: the (d, bucket) projection
    is the SAME portable SQL expression (_cms_bucket_sql) evaluated
    scan-side before the shuffle, and counters merge by exact integer
    SUM — the replayed stream's final counters equal the batch build's
    (tests/test_streaming_sketch.py).

    Scale: state is exactly d×w int64 per key at ANY stream length;
    the ×d row blow-up happens pre-shuffle map-side exactly as the
    batch build's."""
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    from flink_cep_examples_spark.queries.sampling import (
        _CMS_D,
        _CMS_W,
        _cms_bucket_sql,
    )

    probes = sorted(int(u) for u in probe_ids)
    d_col = F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("d")
    projected = (
        df.select(F.col(key_col).alias("event_type"), F.col(id_col))
        .select("event_type", F.col(id_col).alias("user_id"), d_col)
        .select(
            "event_type",
            "d",
            F.expr(_cms_bucket_sql("user_id", "div")).alias("bucket"),
        )
    )
    # probe buckets are a tiny driver-side constant: d rows per probe
    import numpy as _np

    from flink_cep_examples_spark.queries.sampling import (
        _CMS_SALTS,
        _MIX,
        _MOD,
    )

    probe_buckets = {
        u: [
            ((u + s) * _MIX) % _MOD // (1 << 24) for s in _CMS_SALTS
        ]
        for u in probes
    }

    def fold(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            blob, updates = state.get
            counters = (
                _np.frombuffer(blob, dtype=_np.int64)
                .reshape(_CMS_D, _CMS_W)
                .copy()
            )
        else:
            counters = _np.zeros((_CMS_D, _CMS_W), dtype=_np.int64)
            updates = 0
        touched = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            touched = True
            _np.add.at(
                counters,
                (
                    pdf["d"].to_numpy(dtype=_np.int64),
                    pdf["bucket"].to_numpy(dtype=_np.int64),
                ),
                1,
            )
        if not touched:
            return
        updates += 1
        state.update((counters.tobytes(), updates))
        ests = [
            int(
                min(
                    counters[d][b]
                    for d, b in enumerate(probe_buckets[u])
                )
            )
            for u in probes
        ]
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(probes),
                "user_id": probes,
                "updates": [updates] * len(probes),
                "est_cnt": ests,
            }
        )

    return projected.groupBy("event_type").applyInPandasWithState(
        fold,
        outputStructType=_CMS_OUT_SCHEMA,
        stateStructType=_CMS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Round 12: streaming log2-histogram quantiles — the third member of
# the sketch trio (HLL distinct / CMS frequency / histogram quantiles)
# gets its streaming twin, completing the batch/streaming symmetry.
# ---------------------------------------------------------------------------

#: bin 0 (zero/negative) + bit_length of an int64 ≤ 64 → 65 counters.
_QH_BINS = 65

_QH_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("updates", T.LongType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("p5", T.DoubleType(), True),
        T.StructField("p9", T.DoubleType(), True),
        T.StructField("p99", T.DoubleType(), True),
    ]
)

_QH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("counters", T.BinaryType(), True),
        T.StructField("updates", T.LongType(), True),
    ]
)


def quantile_hist_stream(
    df: DataFrame, key_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """Streaming quantile monitor from the mergeable log2 histogram:
    per key, the ≤65 int64 bin counters
    (queries/sampling.py::events_value_quantile_hist geometry) ride
    the state store, each micro-batch folds in by vector add
    (``np.add.at``), and every update emits the RUNNING p50/p90/p99
    estimates — the live ingestion-health view (value-distribution
    drift) the batch query gives post-hoc.

    Bit parity with batch by construction: binning is the SAME
    integer-exact scan-side expression (micro-units half-up round,
    ``length(bin(x))`` bit-length), and the quantile finalization
    replicates the batch arithmetic exactly — rank =
    ``ceil(n·p)`` (one IEEE multiply + ceil), estimate = the smallest
    bin whose cumulative count reaches the rank, reported as the
    bin's exclusive upper edge ``2^b / 1e6`` (bin 0 → 0.0). The
    replayed stream's final row per key equals the batch query's
    bit-for-bit (tests/test_streaming_sketch.py).

    Scale: state is exactly 65×8 bytes per key at ANY stream length —
    the bounded-state answer where exact streaming percentiles would
    retain every row; counters merge by SUM, so restarts/backfills
    compose (the continuous-aggregate property)."""
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    units = F.floor(F.col(value_col) * F.lit(1000000.0) + F.lit(0.5)).cast(
        "bigint"
    )
    projected = df.select(
        F.col(key_col).alias("event_type"),
        F.when(units <= 0, F.lit(0))
        .otherwise(F.length(F.bin(units)))
        .cast("int")
        .alias("b"),
    )

    def _edge(b: int) -> float:
        return 0.0 if b == 0 else (2.0 ** float(b)) / 1000000.0

    def fold(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import math

        if state.exists:
            blob, updates = state.get
            counters = np.frombuffer(blob, dtype=np.int64).copy()
        else:
            counters = np.zeros(_QH_BINS, dtype=np.int64)
            updates = 0
        touched = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            # NULL value column ⇒ b=NULL (bin(NULL) is NULL); the batch
            # twin's histogram groupBy simply never sees those rows, so
            # drop them before the int64 fold (ADVICE r12 low — to_numpy
            # raises on NA). An all-null micro-batch contributes nothing.
            binned = pdf["b"].dropna().to_numpy(dtype=np.int64)
            if not len(binned):
                continue
            touched = True
            np.add.at(counters, binned, 1)
        if not touched:
            return
        updates += 1
        state.update((counters.tobytes(), updates))
        n = int(counters.sum())
        cum = np.cumsum(counters)

        def q(p: float):
            # the batch rank arithmetic exactly: ceil(n_double * p)
            rank = math.ceil(float(n) * p)
            hit = np.nonzero(cum >= rank)[0]
            return _edge(int(hit[0])) if len(hit) else None

        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "updates": [updates],
                "n_rows": [n],
                "p5": [q(0.5)],
                "p9": [q(0.9)],
                "p99": [q(0.99)],
            }
        )

    return projected.groupBy("event_type").applyInPandasWithState(
        fold,
        outputStructType=_QH_OUT_SCHEMA,
        stateStructType=_QH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
