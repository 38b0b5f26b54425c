"""Skew mitigation: two-phase salted aggregation.

At 100 TB a handful of hot keys (one power-user's events, one viral
document) can put an entire aggregation's wall-clock on one reducer.
AQE's skew-join splitting (enabled in session.py) handles *joins*; for
*aggregations* the classic fix is salting: shard each key into
``salt`` sub-keys, pre-aggregate per shard (parallel across reducers),
then combine the shards.

Only algebraic aggregates decompose this way; this helper supports the
ones whose merge is the aggregate itself (sum/count/min/max — count
merges via sum). For avg, express it as sum/count at the call site.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: merge function per phase-1 aggregate
_MERGEABLE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column | str]],
    salt: int = 16,
) -> DataFrame:
    """GroupBy ``keys`` with hot-key skew spread over ``salt`` shards.

    ``aggs`` maps output name → (fn, column), fn ∈ sum|count|min|max.
    Result is row-identical to ``df.groupBy(keys).agg(...)`` — the salt
    column is internal and never escapes.

    >>> salted_agg(events, ["user_id"],
    ...            {"n": ("count", F.lit(1)), "v": ("sum", F.col("value"))})
    """
    unknown = {fn for fn, _ in aggs.values()} - set(_MERGEABLE)
    if unknown:
        raise ValueError(f"non-decomposable aggregate(s): {sorted(unknown)}")
    salted = df.withColumn(
        "__salt", (F.rand(seed=0) * salt).cast("int")  # uniform shard pick
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[
            (F.count(c) if fn == "count" else getattr(F, fn)(c)).alias(name)
            for name, (fn, c) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            _MERGEABLE[fn](name).alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )
