"""Online vector-index maintenance: stream arriving embedding vectors
into a persisted IVF index (round 16) — the vector twin of
``streaming/bm25_stream.py::bm25_index_stream``, completing the
symmetric ingest story: both retrieval arms (lexical BM25, semantic
IVF) now absorb continuous ingest through a batch-keyed DELTA tier
with replay idempotency, ledger-gated serving, and manifest-committed
compaction.

Reference scope: the reference engine (kosmag/flink-cep-examples) has
no retrieval surface — north-star extension territory for the 100-TB
training-data pipeline, where embedding ingest is continuous (every
newly curated document arrives with its vector) and the ANN index
must serve it without retraining or rebuild.

Exactly-once shape: foreachBatch may REPLAY a batch after a failure,
so the ingest body (``queries/ivf.py::ivf_ingest_batch``) partitions
every write by ``batch=<id>`` FIRST and uses dynamic partition
overwrite — a replayed batch rewrites its own partitions. The ledger
row lands AFTER the vectors; serving gates the delta union on the
ledger, so a crash between the two writes leaves an orphan batch that
never serves and that the replay repairs. An id in the manifest's
``absorbed`` list means a compaction/recluster already folded that
batch's content into the base — the guard skips the re-write
entirely (see ``bm25_index_stream`` for the full contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamWriter


def ivf_index_stream(
    spark: SparkSession,
    index_dir: str,
    vec_stream: DataFrame,
    *,
    exact: bool = False,
    max_delta_batches: int | None = None,
) -> DataStreamWriter:
    """Ingest a streaming DataFrame of (``vec_id``, ``label``,
    ``embedding``) vectors into the persisted IVF index at
    ``index_dir``. Per micro-batch: one broadcast-K assignment pass
    against the FROZEN live centroids (no retraining, no shuffle) and
    two idempotent delta-tier writes (vectors, then the ledger row).
    Streamed vectors serve immediately: the probe scan unions the
    base lists with LIVE delta batches, pruned on both partition
    columns.

    ``exact`` selects the assignment kernel (BLAS deployment default;
    the oracle-pinned catalog query passes True for bit-parity with
    its DuckDB twin). ``max_delta_batches`` arms the automatic
    compaction policy (``maybe_compact_ivf``) at the batch tail, so
    the delta tier stays bounded without an operator remembering to
    compact; ``None`` leaves compaction manual.

    Returns the un-started writer so the caller owns
    trigger/checkpoint options. The index must already exist
    (``write_ivf_index`` / ``ensure_ivf_index``)."""
    from flink_cep_examples_spark.index_manifest import read_manifest
    from flink_cep_examples_spark.queries.ivf import (
        ivf_ingest_batch,
        maybe_compact_ivf,
    )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        vecs = batch_df.select("vec_id", "label", "embedding")
        if vecs.isEmpty():
            return
        # absorbed-replay guard: this batch's content already lives in
        # the compacted/reclustered base — the correct replay action
        # is no write at all (see bm25_stream.py for the id-reuse
        # operational contract this implies)
        if int(batch_id) in set(read_manifest(index_dir)["absorbed"]):
            return
        ivf_ingest_batch(
            spark, index_dir, vecs, int(batch_id), exact=exact
        )
        if max_delta_batches is not None:
            maybe_compact_ivf(
                spark, index_dir, max_delta_batches=max_delta_batches
            )

    return vec_stream.writeStream.outputMode("update").foreachBatch(ingest)
