"""IVF recluster-under-drift probe (round 16, VERDICT r15 item 6).

Drives the full index lifecycle the way a production ingest tier would
hit it: train at corpus scale → append a DRIFTED vector population
(20% of the corpus packed far outside the training distribution — the
profile ``embedding_cluster_profile``'s mean-distance creep is meant
to flag) → measure quantizer quality + serving recall against brute
force → ``ivf_recluster_index`` → measure again. Also exercises the
pinned-K guard eviction (a ``k_lists=8`` control retrains AFTER the
auto-K recluster instead of silently serving its quantizer).

Usage: PYTHONPATH=/root/repo python tools/ivf_drift_probe.py [sf_dir]
(default /root/testdata/sf0.1). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main() -> int:
    import numpy as np

    from flink_cep_examples_spark.index_manifest import resolve_tier
    from flink_cep_examples_spark.queries.ivf import (
        ensure_ivf_index,
        ivf_append_vectors,
        ivf_recluster_index,
        ivf_search_persisted,
        write_ivf_index,
    )
    from flink_cep_examples_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    idx = tempfile.mkdtemp(prefix="spark_graft_ivf_drift_")
    t0 = time.perf_counter()
    write_ivf_index(spark, sf_dir, idx, k_lists=None)
    t_train = time.perf_counter() - t0

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n0 = emb.count()
    dim = len(emb.first().embedding)

    # drifted ingest: 20% of corpus mass, far outside the data range
    n_new = n0 // 5
    base = [50.0 + (j % 7) * 0.1 for j in range(dim)]
    new = spark.createDataFrame(
        [
            (9_000_000 + i, 9, [v + (i % 97) * 1e-2 for v in base])
            for i in range(n_new)
        ],
        "vec_id long, label int, embedding array<float>",
    )
    t0 = time.perf_counter()
    ivf_append_vectors(spark, idx, new)
    t_append = time.perf_counter() - t0

    def drift_metric() -> float:
        """Mean distance of the drifted population to its assigned
        centroid — the per-index twin of embedding_cluster_profile's
        mean-distance column."""
        cents = {
            int(r.cid): np.array(r.centroid)
            for r in spark.read.parquet(
                resolve_tier(idx, "centroids")
            ).collect()
        }
        from pyspark.sql import functions as F

        rows = (
            spark.read.parquet(resolve_tier(idx, "lists"))
            .filter(F.col("vec_id") >= 9_000_000)
            .sample(False, min(1.0, 2000 / n_new), seed=7)
            .collect()
        )
        return float(
            np.mean(
                [
                    np.linalg.norm(np.array(r.embedding) - cents[int(r.cid)])
                    for r in rows
                ]
            )
        )

    def recall_at_10() -> float:
        """Serving recall@10 vs brute cosine for 5 drifted queries."""
        qs = [
            [v + (i * 13 % 97) * 1e-2 for v in base] for i in range(5)
        ]
        all_rows = spark.read.parquet(resolve_tier(idx, "lists")).select(
            "vec_id", "embedding"
        ).collect()
        total = 0.0
        for qvec in qs:
            got = {
                r.vec_id
                for r in ivf_search_persisted(
                    spark, idx, qvec, top_k=10
                ).collect()
            }
            q = np.array(qvec)

            def cos(r):
                e = np.array(r.embedding)
                return float(
                    e @ q / (np.linalg.norm(e) * np.linalg.norm(q))
                )

            brute = {
                r.vec_id
                for r in sorted(
                    all_rows, key=lambda r: (-cos(r), r.vec_id)
                )[:10]
            }
            total += len(got & brute) / 10
        return total / len(qs)

    creep = drift_metric()
    recall_before = recall_at_10()
    t0 = time.perf_counter()
    ivf_recluster_index(spark, idx, k_lists=None)
    t_recluster = time.perf_counter() - t0
    recovered = drift_metric()
    recall_after = recall_at_10()

    # pinned-K guard-eviction control: must RETRAIN to K=8
    ensure_ivf_index(spark, sf_dir, idx, k_lists=8)
    k_ctrl = spark.read.parquet(resolve_tier(idx, "centroids")).count()

    import shutil

    shutil.rmtree(idx, ignore_errors=True)
    print(
        json.dumps(
            {
                "probe": "ivf_drift",
                "sf_dir": sf_dir,
                "n_base": n0,
                "n_drifted": n_new,
                "train_sec": round(t_train, 2),
                "append_sec": round(t_append, 2),
                "recluster_sec": round(t_recluster, 2),
                "drift_before": round(creep, 2),
                "drift_after": round(recovered, 2),
                "recall10_before": round(recall_before, 3),
                "recall10_after": round(recall_after, 3),
                "pinned_k_control_retrained": k_ctrl == 8,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
