"""End-to-end training-data build over the ``documents`` corpus,
composed from the engine's curation operators (beyond the reference —
the LLM-pipeline surface):

  1. quality gate       — Gopher-style rule filter (keep == true)
  2. mixture rebalance  — deterministic hash sample to target language
                          shares (rates derived from the data)
  3. sequence packing   — greedy first-fit into 256-token sequences
  4. shard sink         — deterministic hash-sharded sorted parquet
  5. training order     — round 15: the temperature-smoothed mix cut
                          into a stride-interleaved global order and
                          fixed-token-mass shard manifests
                          (docs_training_order / docs_training_shards)

Run: ``python examples/training_data_pipeline.py [sf_dir] [out_dir]``
(defaults: /root/testdata/sf0.001, a temp dir). Prints the stage
counts and the final shard layout.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_cep_examples_spark.queries.curation import docs_gopher_quality  # noqa: E402
from flink_cep_examples_spark.queries.packing import pack_sequences  # noqa: E402
from flink_cep_examples_spark.queries.sampling import docs_mixture_sample  # noqa: E402
from flink_cep_examples_spark.session import get_spark  # noqa: E402
from flink_cep_examples_spark.sources.shards import (  # noqa: E402
    read_training_shards,
    write_training_shards,
)
from flink_cep_examples_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp()
    spark = get_spark(
        app_name="training-data-pipeline",
        master="local[4]",
        shuffle_partitions=4,
    )

    docs = load_table(spark, sf_dir, "documents")
    print(f"corpus: {docs.count()} documents")

    kept = docs_gopher_quality(spark, sf_dir).where("keep").select("doc_id")
    print(f"after quality gate: {kept.count()}")

    mixed = docs_mixture_sample(spark, sf_dir).join(kept, "doc_id")
    print(f"after mixture rebalance: {mixed.count()}")

    sized = mixed.join(
        docs.select(
            "doc_id",
            F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias(
                "n_tokens"
            ),
        ),
        "doc_id",
    )
    packed = pack_sequences(sized)
    n_packs = packed.select("bucket", "pack_seq").distinct().count()
    print(f"packed into {n_packs} sequences")

    shards_path = f"{out_dir}/shards"
    write_training_shards(
        packed, shards_path, "doc_id", n_shards=4, max_records_per_file=1000
    )
    back = read_training_shards(spark, shards_path)
    per_shard = {
        r.shard: r.n
        for r in back.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    print(f"shards at {shards_path}: {dict(sorted(per_shard.items()))}")
    assert sum(per_shard.values()) == packed.count()

    from flink_cep_examples_spark.queries.sampling import (
        docs_training_order,
        docs_training_shards,
    )

    order = docs_training_order(spark, sf_dir)
    head = order.orderBy("ord").limit(8).collect()
    print(
        "training order head (stride-interleaved): "
        + " ".join(f"{r.ord}:{r.lang}" for r in head)
    )
    manifests = sorted(
        docs_training_shards(spark, sf_dir).collect(),
        key=lambda r: r.shard_id,
    )
    print(
        f"{len(manifests)} order shards; first: "
        f"docs={manifests[0].n_docs} tokens={manifests[0].n_tokens} "
        f"langs={manifests[0].n_langs}"
    )
    assert all(m.n_langs > 1 for m in manifests[:-1])
    print("OK")


if __name__ == "__main__":
    main()
