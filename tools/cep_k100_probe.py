"""K=100 scale probe for the CEP side (VERDICT r14 item 3).

The ingest-family K=100 sweeps found two real scale bugs in round 14;
this probe points the same discipline at the CEP chain kernels and the
streaming NFA replay, where SCALING.md evidence previously stopped at
10×:

- BATCH: ``cep_group_chain_within`` and ``cep_group_nested_within``
  (the compiled chain kernels in operators/fast_path.py) over a K×
  key-replica of the events table (``tools/scale_smoke.py::replicate``
  offsets ``user_id`` per replica, so the replica corpus is K× more
  KEYS of comparable per-key series — the shape a 1000-executor
  scale-up actually sees).
- STREAMING: ``match_pattern_stream`` (the reference billing pattern,
  timeouts on) replaying a K× key-replica of the sf billing stream —
  the bench.py cep_streaming methodology at 100× the key count.

Single timed run per (query, scale), no warm run — the k100_probe.py
rationale: at these durations codegen warmup is noise and a 3-run
protocol would take hours. A healthy ratio is ≪ K (sub-linear because
the 1× run is dominated by fixed plan/startup cost and the kernels are
Arrow-batched per task); a ratio ≫ K or a crash is the bug signal.

Usage: python tools/cep_k100_probe.py [K] [sf_dir] [batch|stream|all]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_cep_examples_spark.queries import QUERIES, load_all  # noqa: E402
from flink_cep_examples_spark.session import get_spark  # noqa: E402
from tools.scale_smoke import replicate  # noqa: E402

BATCH_QUERIES = ["cep_group_chain_within", "cep_group_nested_within"]


def batch_probe(spark, sf_dir: str, k: int) -> None:
    def once(name: str, d: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, d).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    with tempfile.TemporaryDirectory() as tmp:
        big = f"{tmp}/x{k}"
        os.environ["SPARK_GRAFT_REPLICATE_TABLES"] = "events"
        replicate(spark, sf_dir, big, k)
        for name in BATCH_QUERIES:
            t1 = once(name, sf_dir)
            tk = once(name, big)
            print(
                json.dumps(
                    {
                        "probe": "cep_batch_k100",
                        "query": name,
                        "t_1x_sec": round(t1, 3),
                        f"t_{k}x_sec": round(tk, 3),
                        "growth": round(tk / t1, 2),
                        "growth_vs_linear": round(tk / t1 / k, 3),
                        "k": k,
                        "runs": 1,
                    }
                ),
                flush=True,
            )


def stream_probe(spark, sf_dir: str, k: int) -> None:
    from pyspark.sql import functions as F

    from flink_cep_examples_spark.plans.pattern import billing_pattern
    from flink_cep_examples_spark.sources.billing import events_as_billing
    from flink_cep_examples_spark.streaming import match_pattern_stream

    billing = events_as_billing(spark, sf_dir)

    def replicated(n: int):
        if n == 1:
            return billing
        return (
            billing.withColumn(
                "r", F.explode(F.array(*[F.lit(i) for i in range(n)]))
            )
            .withColumn("id", F.concat_ws("#", "id", "r"))
            .drop("r")
        )

    for n in (1, k):
        frame = replicated(n)
        n_events = frame.count()
        with tempfile.TemporaryDirectory() as tmp:
            src = f"{tmp}/billing"
            frame.coalesce(max(4, n // 8)).write.parquet(src)
            schema = spark.read.parquet(src).schema
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
                .option("checkpointLocation", f"{tmp}/chk")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "probe": "cep_stream_k100",
                    "replicas": n,
                    "n_events": n_events,
                    "sec": round(dt, 3),
                    "events_per_s": round(n_events / dt),
                    "runs": 1,
                }
            ),
            flush=True,
        )


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    mode = sys.argv[3] if len(sys.argv) > 3 else "all"
    load_all()
    spark = get_spark(
        app_name="cep-k100-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    if mode in ("batch", "all"):
        batch_probe(spark, sf_dir, k)
    if mode in ("stream", "all"):
        stream_probe(spark, sf_dir, k)
    spark.stop()


if __name__ == "__main__":
    main()
