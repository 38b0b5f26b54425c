"""Hot-key streaming throughput probe (round 9, VERDICT r8 item 6).

The streaming CEP operator walks a per-key Python NFA inside each
key-bucket task; a SKEWED key profile serializes the hot key's rows in
one task and its step() loop is the suspected ceiling. This probe
replays the same 10x sf0.1 billing stream as the round-8 uniform
measurement (SCALING.md: 258k events/s) but with a Zipf-like profile:
HOT_FRACTION of all events re-keyed onto ONE user, the rest keeping
their uniform keys. Same operator, same trigger/checkpoint methodology
as bench.py's cep_streaming block.

Usage: PYTHONPATH=/root/repo python tools/stream_hotkey_probe.py \
        [replicas] [hot_fraction]
(defaults 10 and 0.5 — the round-9 protocol; round 15 also ran it at
replicas=100 for the skew-at-scale stress case). Prints one JSON line
with events/s for the uniform control and the skewed profile.
"""

from __future__ import annotations

import json
import os
import tempfile
import time


def main() -> None:
    from pyspark.sql import functions as F

    from flink_cep_examples_spark.plans.pattern import billing_pattern
    from flink_cep_examples_spark.session import get_spark
    from flink_cep_examples_spark.sources.billing import events_as_billing
    from flink_cep_examples_spark.streaming import match_pattern_stream

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=8)

    import sys

    STREAM_REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    HOT_FRACTION = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    billing = events_as_billing(spark, sf_dir)
    rep = (
        billing.withColumn(
            "r",
            F.explode(
                F.array(*[F.lit(i) for i in range(STREAM_REPLICAS)])
            ),
        )
        .withColumn("id", F.concat_ws("#", "id", "r"))
        .drop("r")
    )
    # skewed twin: HOT_FRACTION of rows (pseudorandom by hash) onto one
    # key. Timestamps are untouched — the hot key just sees a denser
    # event stream, which is exactly the adversarial profile (more live
    # runs per step, one task owning the walk).
    skewed = rep.withColumn(
        "id",
        F.when(
            F.pmod(F.xxhash64("id", "event_time"), F.lit(100))
            < int(HOT_FRACTION * 100),
            F.lit("hot#0"),
        ).otherwise(F.col("id")),
    )
    n_events = rep.count()

    results: dict[str, float] = {}
    for name, frame in (("uniform", rep), ("skewed", skewed)):
        with tempfile.TemporaryDirectory() as tmp:
            src = f"{tmp}/billing"
            frame.coalesce(4).write.parquet(src)
            schema = spark.read.parquet(src).schema

            def run_stream(chk: str) -> float:
                stream = spark.readStream.schema(schema).parquet(src)
                out = match_pattern_stream(
                    stream,
                    billing_pattern(emit_timeouts=True),
                    "6 minutes",
                    n_buckets=32,
                )
                t0 = time.perf_counter()
                q = (
                    out.writeStream.outputMode("append")
                    .format("noop")
                    .option("checkpointLocation", f"{tmp}/{chk}")
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                return time.perf_counter() - t0

            run_stream("warmup")
            best = min(run_stream("chk1"), run_stream("chk2"))
            results[name] = round(best, 3)

    print(
        json.dumps(
            {
                "probe": "stream_hotkey",
                "n_events": n_events,
                "hot_fraction": HOT_FRACTION,
                "uniform_sec": results["uniform"],
                "skewed_sec": results["skewed"],
                "uniform_events_per_s": round(n_events / results["uniform"]),
                "skewed_events_per_s": round(n_events / results["skewed"]),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
