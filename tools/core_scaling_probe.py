"""Core-scaling probe (round 17, VERDICT r16 item 5): time the
heaviest bench queries on a LARGER input (the 10x disjoint-key
replication of sf0.1 — tools/scale_smoke.py machinery) at two core
counts, so the parallelism claim rests on a measured core-ratio
instead of the sf0.1 wall of per-action overhead (where every 8-vs-32
ratio was ~1 and the 8-core TOTAL was faster).

Usage:
  python tools/core_scaling_probe.py <cores> <data_dir> [query ...]

Runs ONE core count per process (a fresh JVM per configuration — the
two runs must not share a warmed executor pool); the wrapper runs it
twice and joins the results:

  python tools/core_scaling_probe.py 32 /tmp/sf0.1_x10 > /tmp/probe32.json
  python tools/core_scaling_probe.py 8  /tmp/sf0.1_x10 > /tmp/probe8.json

Methodology: same as bench.py — construct + noop-sink write, one
warmup invocation, then min of 3 timed invocations per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_cep_examples_spark.queries import QUERIES, load_all  # noqa: E402
from flink_cep_examples_spark.session import get_spark  # noqa: E402

#: the heaviest driver-bench queries (BENCH_r16.json order) — the
#: shuffle/kernel-bound shapes the scaling story needs evidence for
DEFAULT_QUERIES = [
    "ann_ivfadc_topk",
    "sources_kmv_jaccard",
    "dedup_clusters",
    "docs_training_order",
    "semdedup_prune",
    "corpus_clean_pipeline",
    "dedup_minhash_lsh",
]


def main() -> None:
    cores = int(sys.argv[1])
    data_dir = sys.argv[2]
    names = sys.argv[3:] or DEFAULT_QUERIES
    load_all()
    spark = get_spark(
        app_name=f"core-scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"{name}: warmup")
        fn(spark, data_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for i in range(3):
            spark.sparkContext.setJobDescription(f"{name}: timed {i}")
            t0 = time.perf_counter()
            fn(spark, data_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(f"# {name}: {out[name]}s", file=sys.stderr, flush=True)
    print(json.dumps({"cores": cores, "dir": data_dir, "sec": out}))


if __name__ == "__main__":
    main()
