"""Throughput probe for the round-13 ingest curation pipeline
(decontaminate → NB quality → token-budget admission) — one streaming
job, availableNow replay of the sf documents table.

Usage: python tools/ingest_pipeline_probe.py [sf_dir] [n_files]
Prints one JSON line with docs/sec and the per-stage composition.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_cep_examples_spark.queries.decontam import (  # noqa: E402
    _MIX,
    _MOD,
    EVAL_MOD,
    EVAL_RESIDUE,
)
from flink_cep_examples_spark.queries.sampling import token_budgets  # noqa: E402
from flink_cep_examples_spark.session import get_spark  # noqa: E402
from flink_cep_examples_spark.streaming import (  # noqa: E402
    budget_admission_stream,
    decontaminate_stream,
    eval_window_hash_set,
    nb_quality_score,
    train_nb_quality_model,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(app_name="ingest-probe")
    spark.sparkContext.setLogLevel("ERROR")

    ev = eval_window_hash_set(spark, sf_dir)
    model = train_nb_quality_model(spark, sf_dir)
    budgets = token_budgets(spark, sf_dir)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        f"(doc_id * {_MIX}) % {_MOD} % {EVAL_MOD} != {EVAL_RESIDUE}"
    )
    n_docs = docs.count()
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        docs.repartition(n_files).write.parquet(src)
        chk = os.path.join(tmp, "chk")

        def run() -> tuple[float, int]:
            stream = spark.readStream.schema(docs.schema).parquet(src)
            flagged = decontaminate_stream(
                stream, ev, emit_clean=True,
                passthrough=("text", "lang", "n_chars"),
            )
            scored = nb_quality_score(
                flagged.filter("n_hits = 0"), model,
                passthrough=("lang", "n_chars"),
            )
            out = budget_admission_stream(
                scored.filter("pred_good"), budgets
            )
            t0 = time.perf_counter()
            q = (
                out.writeStream.format("memory")
                .queryName("probe")
                .outputMode("append")
                .option("checkpointLocation", chk + str(time.monotonic_ns()))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(1200)
            wall = time.perf_counter() - t0
            admitted = spark.sql("SELECT COUNT(*) c FROM probe").first().c
            return wall, admitted

        run()  # warmup (plan + python worker pool)
        walls = []
        admitted = 0
        for _ in range(3):
            w, admitted = run()
            walls.append(round(w, 3))
        best = min(walls)
        print(
            json.dumps(
                {
                    "probe": "ingest_curation_pipeline",
                    "sf_dir": sf_dir,
                    "docs": n_docs,
                    "admitted": admitted,
                    "wall_sec": best,
                    "walls": walls,
                    "docs_per_sec": round(n_docs / best, 1),
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
