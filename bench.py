"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "headline_total", "value": <sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": <sf>}

Each query is materialized with the noop sink (full execution, no
driver-side collect). A small warmup run amortizes JVM/codegen startup
so timings reflect steady-state throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import tempfile

from flink_cep_examples_spark.queries import QUERIES, load_all
from flink_cep_examples_spark.session import get_spark

#: benchmarked query set: CEP tiers + one representative per
#: extension family (relational, windows/sessions, dedup, text, ANN).
HEADLINE = [
    "cep_alert_reactions",
    "cep_alerts_with_timeouts",
    "cep_alert_reactions_nfa",
    "cep_match_recognize",
    "cep_match_recognize_all_rows",
    "cep_keyed_process",
    "cep_absence_not_followed_by",
    "q1_pricing_summary",
    "q5_regional_revenue",
    "events_sessions",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_fingerprint",
    "mm_frame_sample",
    "ann_bruteforce_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    load_all()
    spark = get_spark(app_name="cep-bench")

    # warmup each headline plan at the smallest SF: compiles the same
    # codegen/plan shape so timings below measure steady-state
    # throughput, not first-call JIT+codegen compilation.
    for name in HEADLINE:
        if name in QUERIES:
            QUERIES[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()

    # min of 2 timed runs per query: the machine is shared, and min is
    # the standard robust estimator of steady-state latency.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # streaming CEP micro-batch throughput (BASELINE.md TBD row):
    # materialize the billing mapping once, replay it through the
    # stateful streaming operator (file source, availableNow).
    from flink_cep_examples_spark.plans.pattern import billing_pattern
    from flink_cep_examples_spark.sources.billing import events_as_billing
    from flink_cep_examples_spark.streaming import match_pattern_stream

    billing = events_as_billing(spark, sf_dir)
    n_events = billing.count()
    # A stateful streaming job is provisioned separately from batch: AQE
    # is disabled for stateful workloads, so the stateful exchange width
    # is pinned by spark.sql.shuffle.partitions at plan time. At this
    # bench scale the work per micro-batch is small and fixed per-task
    # costs dominate — size the state stores at 4 (measured optimum;
    # at 100 TB this is the knob you raise with the cluster).
    saved_partitions = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        with tempfile.TemporaryDirectory() as tmp:
            src = f"{tmp}/billing"
            billing.coalesce(4).write.parquet(src)
            schema = spark.read.parquet(src).schema

            def run_stream(chk: str) -> float:
                stream = spark.readStream.schema(schema).parquet(src)
                out = match_pattern_stream(
                    stream,
                    billing_pattern(emit_timeouts=True),
                    "6 minutes",
                    n_buckets=16,
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

            run_stream("warmup")  # python-worker spawn + state-store init
            timings["cep_streaming"] = round(
                min(run_stream("chk1"), run_stream("chk2")), 3
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved_partitions)

    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "cep_batch_events_per_sec": round(
                    n_events / timings["cep_alerts_with_timeouts"]
                ),
                "cep_streaming_events_per_sec": round(
                    n_events / timings["cep_streaming"]
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
