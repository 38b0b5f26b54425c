"""One-shot K=100 scale probe (VERDICT r13 item 6) for the pair-graph
families whose OUTPUT grows super-linearly on the replica corpus by
construction: dedup_minhash_lsh → dedup_clusters, and
docs_winnowing_overlap.

Differs from tools/scale_smoke.py deliberately: ONE timed run per
(query, scale) with no warm run — at the multi-minute durations the
100× pair graphs reach, codegen warmup is noise, and scale_smoke's
3-runs-each protocol would take hours (measured: the 100×
dedup_clusters pair-distinct alone ran >25 min per attempt).

Usage: python tools/k100_probe.py [K] [sf_dir] [query ...]
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

DEFAULT = ["dedup_minhash_lsh", "dedup_clusters", "docs_winnowing_overlap"]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or DEFAULT
    load_all()
    spark = get_spark(
        app_name="k100-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tools.scale_smoke import _auto_queries

    def once(name: str, d: str) -> float:
        fn = QUERIES.get(name) or _auto_queries()[name]
        t0 = time.perf_counter()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    with tempfile.TemporaryDirectory() as tmp:
        big = f"{tmp}/x{k}"
        os.environ.setdefault("SPARK_GRAFT_REPLICATE_TABLES", "documents")
        replicate(spark, sf_dir, big, k)
        for name in names:
            t1 = once(name, sf_dir)
            tk = once(name, big)
            print(
                json.dumps(
                    {
                        "query": name,
                        "t_1x_sec": round(t1, 3),
                        f"t_{k}x_sec": round(tk, 3),
                        "growth": round(tk / t1, 2),
                        "k": k,
                        "runs": 1,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
