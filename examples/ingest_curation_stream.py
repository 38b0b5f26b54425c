"""Round-13 INGEST-TIME curation pipeline — the streaming counterpart
of examples/corpus_dedup_curation.py's batch sweep: documents are
curated as they ARRIVE, in one Structured-Streaming job chaining

  1. decontamination   — drop docs sharing an 8-token window hash with
                         the frozen eval set (stateless mapInPandas;
                         exact agreement with the batch sweep)
  2. learned quality   — score against the frozen Naive-Bayes quality
                         model, keep predicted-good docs (stateless
                         mapInPandas; bit-equal to the batch query)
  3. budget admission  — fill per-language TOKEN budgets, then stop
                         admitting (applyInPandasWithState, O(1) state
                         per key)

— two stateless stages feeding the one stateful stage, the shape
Spark's single-stateful-operator constraint prescribes. All three
models/configs (eval hash set, NB weights, budgets) are trained/frozen
BEFORE ingest, the deployment reality.

Run: ``python examples/ingest_curation_stream.py [sf_dir]``
(default /root/testdata/sf0.001). Prints per-stage counts.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_cep_examples_spark.queries.sampling import token_budgets  # noqa: E402
from flink_cep_examples_spark.session import get_spark  # noqa: E402
from flink_cep_examples_spark.streaming import (  # noqa: E402
    budget_admission_stream,
    decontaminate_stream,
    eval_window_hash_set,
    nb_quality_score,
    train_nb_quality_model,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        app_name="ingest-curation", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")

    # --- train/freeze everything BEFORE ingest ---
    ev = eval_window_hash_set(spark, sf_dir)
    model = train_nb_quality_model(spark, sf_dir)
    budgets = token_budgets(spark, sf_dir)
    print(
        f"[frozen artifacts] {len(ev)} eval window hashes, "
        f"{len(model.weights)} NB weights, budgets for "
        f"{len(budgets)} languages"
    )

    # the arriving corpus excludes the frozen eval slice (an eval doc
    # never arrives at ingest — and would trivially self-hit)
    from flink_cep_examples_spark.queries.decontam import (
        _MIX,
        _MOD,
        EVAL_MOD,
        EVAL_RESIDUE,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        f"(doc_id * {_MIX}) % {_MOD} % {EVAL_MOD} != {EVAL_RESIDUE}"
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        docs.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        flagged = decontaminate_stream(
            stream, ev, emit_clean=True,
            passthrough=("text", "lang", "n_chars"),
        )
        clean = flagged.filter("n_hits = 0")
        scored = nb_quality_score(
            clean, model, passthrough=("lang", "n_chars")
        )
        good = scored.filter("pred_good")
        admitted = budget_admission_stream(good, budgets)

        q = (
            admitted.writeStream.format("memory")
            .queryName("ingest_admitted")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        out = spark.sql("SELECT * FROM ingest_admitted").cache()

        n_docs = docs.count()
        n_admit = out.count()
        print(
            f"[pipeline] {n_docs} arriving docs -> {n_admit} admitted "
            f"(decontaminated, quality-gated, budget-capped)"
        )
        mass = {
            r.lang: r.m
            for r in out.groupBy("lang")
            .agg(F.sum("tok").alias("m"))
            .collect()
        }
        for lang in sorted(budgets):
            got = mass.get(lang, 0)
            state = "filled" if got >= budgets[lang] else "supply-bound"
            print(
                f"  {lang}: {got} tokens admitted "
                f"(budget {budgets[lang]}, {state})"
            )


if __name__ == "__main__":
    main()
