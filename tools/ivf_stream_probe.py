"""Online IVF ingest probe (round 16): measures the delta tier's
ingest throughput, the serve-time read-amplification cost of an
unbounded delta tier (the thing `maybe_compact_ivf` exists to bound),
and the compaction payoff.

Phases (sf0.1 base, 32 streamed batches x 500 synthetic vectors):
1. train the base index;
2. stream 32 single-file batches through ivf_index_stream (no policy)
   — ingest wall + vectors/s;
3. serve min-of-3 with all 32 delta batches live (worst-case small-file
   amplification per probe scan);
4. ivf_compact_index, serve min-of-3 again — the recovered latency;
5. re-run the ingest with max_delta_batches=8 and report how many
   compactions the policy fired in-stream.

Usage: PYTHONPATH=/root/repo python tools/ivf_stream_probe.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


N_BATCHES = 32
BATCH_VECS = 500


def main() -> int:
    from pyspark.sql import functions as F

    from flink_cep_examples_spark.index_manifest import read_manifest
    from flink_cep_examples_spark.queries.ivf import (
        ivf_compact_index,
        ivf_search_persisted,
        write_ivf_index,
    )
    from flink_cep_examples_spark.streaming import ivf_index_stream

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from flink_cep_examples_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    src0 = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter("vec_id = 0")
        .first()
    )
    dim = len(src0.embedding)
    qvec = [float(x) for x in src0.embedding]

    def synth(seed: int):
        rows = [
            (
                10_000_000 + seed * BATCH_VECS + i,
                int(i % 7),
                [
                    float(((seed * 31 + i * 17 + d * 7) % 1000) / 100.0)
                    for d in range(dim)
                ],
            )
            for i in range(BATCH_VECS)
        ]
        return spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<float>"
        )

    def run_ingest(idx: str, policy: int | None) -> tuple[float, int]:
        src = tempfile.mkdtemp(prefix="ivf_probe_src_")
        for b in range(N_BATCHES):
            synth(b).coalesce(1).write.mode("append").parquet(src)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        chk = tempfile.mkdtemp(prefix="ivf_probe_chk_")
        t0 = time.perf_counter()
        q = (
            ivf_index_stream(
                spark, idx, stream, max_delta_batches=policy
            )
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(1800), "ingest stream timed out"
        dt = time.perf_counter() - t0
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(chk, ignore_errors=True)
        return dt, read_manifest(idx)["version"]

    def serve_min3(idx: str) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            ivf_search_persisted(spark, idx, qvec, top_k=10).collect()
            best = min(best, time.perf_counter() - t0)
        return best

    # ---- unbounded delta tier ----
    idx_a = tempfile.mkdtemp(prefix="spark_graft_ivf_probe_a_")
    write_ivf_index(spark, sf_dir, idx_a)
    t_ingest, _ = run_ingest(idx_a, policy=None)
    n_live = len(
        spark.read.parquet(f"{idx_a}/ingest_ledger")
        .select("batch")
        .distinct()
        .collect()
    )
    serve_delta = serve_min3(idx_a)
    t0 = time.perf_counter()
    ivf_compact_index(spark, idx_a)
    t_compact = time.perf_counter() - t0
    serve_compacted = serve_min3(idx_a)
    shutil.rmtree(idx_a, ignore_errors=True)

    # ---- policy-bounded run ----
    idx_b = tempfile.mkdtemp(prefix="spark_graft_ivf_probe_b_")
    write_ivf_index(spark, sf_dir, idx_b)
    v0 = read_manifest(idx_b)["version"]
    t_ingest_policy, v_end = run_ingest(idx_b, policy=8)
    serve_policy = serve_min3(idx_b)
    shutil.rmtree(idx_b, ignore_errors=True)

    n_vecs = N_BATCHES * BATCH_VECS
    print(
        json.dumps(
            {
                "probe": "ivf_stream",
                "sf_dir": sf_dir,
                "n_batches": N_BATCHES,
                "n_vectors": n_vecs,
                "ingest_sec": round(t_ingest, 2),
                "ingest_vecs_per_s": round(n_vecs / t_ingest),
                "live_batches_at_serve": n_live,
                "serve_sec_delta32": round(serve_delta, 3),
                "compact_sec": round(t_compact, 2),
                "serve_sec_compacted": round(serve_compacted, 3),
                "policy_compactions": v_end - v0,
                "ingest_sec_with_policy": round(t_ingest_policy, 2),
                "serve_sec_policy_bounded": round(serve_policy, 3),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
