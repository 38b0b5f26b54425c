"""Exact discrete percentiles per group, computed rank-side so both
engines agree bit-for-bit.

Built-in ``percentile_approx`` is the right call at 100 TB (bounded
sketch state, one pass), but its t-digest output is
implementation-defined — useless against a cross-engine value hash.
``percentile_cont`` interpolates with float arithmetic whose
association differs between engines. The discrete percentile (value at
rank ``ceil(q * n)``) is pure integer rank selection over the group's
sort order: deterministic everywhere, and still one shuffle.

Scale shape: ranking a group requires its rows co-located — the same
single Exchange a grouped sort needs. Per-group state beyond the sort
is O(1) (rank counter). For truly hot groups you'd switch to
``percentile_approx`` and accept sketch semantics; this operator is the
exact twin that validates it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_cep_examples_spark.queries import register
from flink_cep_examples_spark.sources.tables import load_table

QS = (50, 90, 99)


def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of ``value`` per event_type (discrete: element at
    rank ceil(q/100 * n), ties broken by value order)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    picks = [
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * q / 100), F.col("value")
            )
        ).alias(f"p{q}")
        for q in QS
    ]
    return ranked.groupBy("event_type").agg(
        F.max("n").alias("n_rows"), *picks
    )


_PICKS = ",\n       ".join(
    f"MAX(CASE WHEN rn = CEIL(n * {q} / 100) THEN value END) AS p{q}"
    for q in QS
)

ORACLE_PERCENTILES = f"""
WITH ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type, MAX(n) AS n_rows,
       {_PICKS}
FROM ranked GROUP BY event_type
"""


register(
    "events_value_percentiles", events_value_percentiles, ORACLE_PERCENTILES,
    driver=False,  # r4.2 rotation: driver-verified green in r2+r3; pytest-gated
)
