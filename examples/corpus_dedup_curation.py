"""Corpus dedup + quality-curation pass over ``documents``, composed
from the round-6 operators (the LLM-pipeline surface beyond the
reference):

  1. winnowing dedup    — MOSS fingerprints → overlap pairs →
                          connected components → keep one doc per
                          near-dup cluster (corpus_winnow_dedup)
  2. containment prune  — drop docs that are ≥0.8 contained in a
                          surviving larger doc (dedup_containment —
                          the excerpt/quote case Jaccard misses)
  3. quality terciles   — CCNet-style head/middle/tail per language
                          over the unigram-LM score; keep head+middle
                          (docs_logprob_buckets)
  4. sketch audit       — HyperLogLog distinct-user estimate per
                          event_type (events_hll_distinct), the
                          bounded-state audit a 100 TB run uses where
                          COUNT(DISTINCT) cannot

Run: ``python examples/corpus_dedup_curation.py [sf_dir]``
(default /root/testdata/sf0.001). Prints per-stage survivor counts.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_cep_examples_spark.queries.curation import (  # noqa: E402
    docs_logprob_buckets,
)
from flink_cep_examples_spark.queries.dedup import (  # noqa: E402
    dedup_containment,
)
from flink_cep_examples_spark.queries.pipeline import (  # noqa: E402
    corpus_winnow_dedup,
)
from flink_cep_examples_spark.queries.sampling import (  # noqa: E402
    events_hll_distinct,
)
from flink_cep_examples_spark.session import get_spark  # noqa: E402
from flink_cep_examples_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        app_name="corpus-dedup-curation", master="local[4]",
        shuffle_partitions=4,
    )

    docs = load_table(spark, sf_dir, "documents")
    print(f"corpus: {docs.count()} documents")

    kept = corpus_winnow_dedup(spark, sf_dir).where("kept").select("doc_id")
    print(f"after winnowing dedup (one per cluster): {kept.count()}")

    contained = (
        dedup_containment(spark, sf_dir)
        .join(kept.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .select(F.col("doc_a").alias("doc_id"))
        .distinct()
    )
    kept = kept.join(contained, "doc_id", "left_anti")
    print(f"after containment prune: {kept.count()}")

    quality = docs_logprob_buckets(spark, sf_dir).where(
        F.col("bucket") != "tail"
    )
    final = kept.join(quality.select("doc_id", "lang", "bucket"), "doc_id")
    print(f"after head+middle quality gate: {final.count()}")
    final.groupBy("lang", "bucket").count().orderBy("lang", "bucket").show()

    print("event audit (HLL distinct users per type):")
    events_hll_distinct(spark, sf_dir).select(
        "event_type", F.round("est_distinct", 1).alias("est_users")
    ).orderBy("event_type").show()


if __name__ == "__main__":
    main()
