"""Stream-stream interval join — the DataStream-API sibling of the CEP
operator (Flink's ``keyedA.intervalJoin(keyedB).between(lo, up)``;
beyond the reference, which composes its two-event sequences with the
CEP pattern operator instead).

Spark-first mapping: Structured Streaming's native stream-stream inner
join. Both sides carry a watermark and the join condition is an
equi-key plus an event-time range — exactly the shape Spark's
StreamingSymmetricHashJoin understands, so IT manages the join state
and evicts rows once the watermark passes ``upper`` (state is bounded
by the interval + watermark delay, the same bound Flink's interval-join
operator keeps). No Python in the path: both buffers, the range check,
and eviction run in the JVM.

At 100 TB the plan is one Exchange per side on the join key (co-
partitioned state store); key skew is the only hazard, the same salting
story as any keyed join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    lower_seconds: int,
    upper_seconds: int,
    watermark_delay: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join rows sharing key ``on`` where
    ``right_time ∈ [left_time + lower, left_time + upper]`` (bounds
    inclusive, Flink ``between`` semantics; ``left_time``/``right_time``
    must be distinct column names). Works on two streaming DataFrames —
    or two batch DataFrames, where the identical expression tree makes
    the batch result the streaming oracle.

    ``how="left_outer"`` additionally emits unmatched left rows with
    nulls (beyond Flink, whose ``intervalJoin`` is inner-only) — in
    streaming, an unmatched row is emitted once the watermark proves no
    further match can arrive (left_time + upper + delay). Note the
    global watermark is the MIN over both sides' (max event time -
    delay), so a quiet LEFT side also stalls null emission; tail rows
    whose horizon hasn't closed when a finite replay ends are withheld
    — trim comparisons to the closed horizon."""
    if left_time == right_time:
        raise ValueError("left_time and right_time must differ (rename one)")
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join type: {how}")
    streaming = left.isStreaming
    if streaming:
        left = left.withWatermark(left_time, watermark_delay)
        right = right.withWatermark(right_time, watermark_delay)
    lt, rt = F.col(left_time), F.col(right_time)
    cond: Column = (
        (left[on] == right[on])
        & (rt >= lt + F.expr(f"INTERVAL {lower_seconds} SECONDS"))
        & (rt <= lt + F.expr(f"INTERVAL {upper_seconds} SECONDS"))
    )
    return left.join(right, cond, how).drop(right[on])
