"""Round-12 curation POLICIES over ``documents``/``embeddings`` — the
decision layer a training-data pipeline runs after detection:

  1. keep-best dedup     — near-dup clusters keep their highest-
                           QUALITY member, not an arbitrary canonical
                           doc (dedup_keep_best: LSH clusters ×
                           quality scores, one kept doc per cluster)
  2. soft quality gate   — quality-WEIGHTED sampling instead of the
                           binary keep cliff: keep probability from an
                           all-int64 saturating length curve with
                           digit/punct rate cuts
                           (docs_quality_weighted_sample)
  3. diverse retrieval   — MMR rerank of the exact-cosine candidate
                           pool: each pick trades relevance against
                           redundancy to the picks so far
                           (ann_mmr_topk)
  4. token-budget mix    — fill per-language TOKEN budgets (the unit
                           real mixes are specified in) with the
                           minimal deterministic hash-order prefix
                           (docs_token_budget_mix, round 13)
  5. learned quality     — the GPT-3/CCNet classifier stage: a
                           Naive-Bayes model trained on the rule
                           filter's weak labels scores every doc by
                           log-odds and grades the rule's cliff
                           (docs_nb_quality_classifier, round 13)

Run: ``python examples/curation_policies.py [sf_dir]``
(default /root/testdata/sf0.001). Prints per-policy decisions.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_cep_examples_spark.queries.dedup import dedup_keep_best  # noqa: E402
from flink_cep_examples_spark.queries.sampling import (  # noqa: E402
    docs_quality_weighted_sample,
)
from flink_cep_examples_spark.queries.similarity import (  # noqa: E402
    ann_mmr_topk,
)
from flink_cep_examples_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        app_name="curation-policies", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")

    kb = dedup_keep_best(spark, sf_dir)
    stats = kb.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.col("kept").cast("int")).alias("kept"),
        F.countDistinct("cluster_id").alias("clusters"),
    ).first()
    dropped = stats.docs - stats.kept
    print(
        f"[keep-best dedup] {stats.docs} docs in {stats.clusters} clusters"
        f" -> kept {stats.kept}, dropped {dropped} lower-quality near-dups"
    )
    kb.filter(~F.col("kept")).orderBy("cluster_id", "doc_id").show(
        5, truncate=False
    )

    qw = docs_quality_weighted_sample(spark, sf_dir)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_kept = qw.count()
    print(
        f"[quality-weighted sample] kept {n_kept}/{n_docs} docs"
        f" ({100.0 * n_kept / n_docs:.1f}%) by the soft rate curve"
    )
    qw.orderBy(F.asc("rate_ppm")).show(5, truncate=False)

    mmr = ann_mmr_topk(spark, sf_dir)
    print("[MMR-diversified retrieval] top picks (relevance vs redundancy):")
    mmr.orderBy("rk").show(truncate=False)

    from flink_cep_examples_spark.queries.sampling import (
        docs_token_budget_mix,
        token_budgets,
    )

    tb = docs_token_budget_mix(spark, sf_dir)
    mass = {
        r.lang: r.m
        for r in tb.groupBy("lang").agg(F.sum("tok").alias("m")).collect()
    }
    budgets = token_budgets(spark, sf_dir)
    print("[token-budget mix] admitted token mass vs budget per language:")
    for lang in sorted(budgets):
        print(
            f"  {lang}: {mass.get(lang, 0)} tokens"
            f" (budget {budgets[lang]}, overshoot"
            f" {mass.get(lang, 0) - budgets[lang]})"
        )

    from flink_cep_examples_spark.queries.curation import (
        docs_nb_quality_classifier,
    )

    nb = docs_nb_quality_classifier(spark, sf_dir)
    agg = nb.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("rule_good") == F.col("pred_good")).cast("int")).alias(
            "agree"
        ),
        F.sum(F.col("pred_good").cast("int")).alias("pred_good"),
    ).first()
    print(
        f"[learned quality] NB classifier vs its weak rule labels:"
        f" {agg.agree}/{agg.n} agree, {agg.pred_good} predicted good;"
        f" boundary-bin disagreements (graded evidence, not a cliff):"
    )
    nb.filter(F.col("rule_good") != F.col("pred_good")).orderBy(
        "doc_id"
    ).show(5, truncate=False)


if __name__ == "__main__":
    main()
