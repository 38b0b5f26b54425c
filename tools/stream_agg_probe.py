"""Streaming aggregate-fold throughput probe (round 11).

Aggregate MEASURES add a per-consumed-row Python fold to the streaming
NFA walk (Nfa.enable_payload_fold); ALL ROWS additionally captures every
consumed row. This probe replays the same 10x sf0.1 billing stream as
the round-8 uniform measurement three ways — first/last measures only
(the round-10 baseline path), with the full aggregate battery, and with
ALL ROWS PER MATCH — to bound the fold's cost class. Same operator,
trigger, and checkpoint methodology as bench.py's cep_streaming block.

Usage: PYTHONPATH=/root/repo python tools/stream_agg_probe.py
Prints one JSON line with events/s per variant.
"""

from __future__ import annotations

import json
import os
import tempfile
import time


BASE_BODY = """
  PARTITION BY id ORDER BY event_time
  MEASURES FIRST(A.datetime) AS alarm_dt, LAST(C.datetime) AS topup_dt,
           COUNT(B.*) AS n_b
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (A B* C) WITHIN INTERVAL '1' HOUR
  DEFINE
    A AS A.balanceBefore >= 10 AND A.balanceAfter < 10,
    B AS B.balanceBefore >= B.balanceAfter,
    C AS C.balanceBefore < C.balanceAfter
"""

AGG_BODY = BASE_BODY.replace(
    "COUNT(B.*) AS n_b",
    "SUM(B.balanceAfter) AS sum_b, AVG(B.balanceAfter) AS avg_b, "
    "MIN(B.balanceAfter) AS min_b, MAX(B.balanceAfter) AS max_b, "
    "COUNT(B.balanceAfter) AS nb_vals",
)

ALL_ROWS_BODY = BASE_BODY.replace(
    "ONE ROW PER MATCH", "ALL ROWS PER MATCH"
).replace(
    "FIRST(A.datetime) AS alarm_dt, LAST(C.datetime) AS topup_dt,\n"
    "           COUNT(B.*) AS n_b",
    "FINAL COUNT(B.*) AS n_b, SUM(B.balanceAfter) AS sum_b",
)


def main() -> None:
    from pyspark.sql import functions as F

    from flink_cep_examples_spark.session import get_spark
    from flink_cep_examples_spark.sources.billing import events_as_billing
    from flink_cep_examples_spark.sql.match_recognize import (
        match_recognize,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    STREAM_REPLICAS = 10
    billing = events_as_billing(spark, sf_dir)
    rep = (
        billing.withColumn(
            "r",
            F.explode(F.array(*[F.lit(i) for i in range(STREAM_REPLICAS)])),
        )
        .withColumn("id", F.concat_ws("#", "id", "r"))
        .drop("r")
    )
    src = os.path.join(tempfile.mkdtemp(), "billing_rep")
    rep.coalesce(4).write.parquet(src)
    n_events = spark.read.parquet(src).count()

    result = {"sf": sf_dir, "replicas": STREAM_REPLICAS, "events": n_events}
    # an unmeasured warmup replay absorbs JVM/codegen/state-store
    # startup so variant order doesn't skew the comparison
    for name, body in (
        ("warmup", BASE_BODY),
        ("first_last", BASE_BODY),
        ("aggregates", AGG_BODY),
        ("all_rows", ALL_ROWS_BODY),
    ):
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        out = match_recognize(stream, body)
        t0 = time.time()
        q = (
            out.writeStream.format("noop")
            .option(
                "checkpointLocation",
                os.path.join(tempfile.mkdtemp(), f"chk_{name}"),
            )
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        dt = time.time() - t0
        if name != "warmup":
            result[f"{name}_events_per_sec"] = round(n_events / dt)
            result[f"{name}_sec"] = round(dt, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
