"""Round-16 epoch semantics (self-review findings): delta ledger rows
record the manifest epoch they were written under, and the serve path
gates on it — a batch racing a recluster can never serve misrouted
against the new quantizer (it is re-assigned and folded by the next
compaction), and a rebuild's epoch bump + absorbed reset means a
brand-new ingest checkpoint's batch 0 is neither skip-guarded nor
polluted by pre-rebuild delta."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_cep_examples_spark.index_manifest import (
    read_manifest,
    resolve_tier,
)


def _twin_vectors(spark, sf_small, base_id, n=4):
    src = (
        spark.read.parquet(f"{sf_small}/embeddings.parquet")
        .filter("vec_id = 0")
        .first()
    )
    qvec = [float(x) for x in src.embedding]
    rows = [
        (base_id + i, src.label, [v + (i + 1) * 1e-4 for v in qvec])
        for i in range(n)
    ]
    return qvec, spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )


def test_batch_racing_recluster_never_serves_misrouted(
    spark, sf_small, tmp_path
):
    """The round-16 review's top finding: a streamed batch assigned
    against the OLD quantizer, whose ledger row lands as a recluster
    publishes the new one, must be (a) excluded from serving — its
    cids are meaningless under the new centroids — and (b) repaired
    by the next compaction: re-assigned against the current centroids
    and folded, after which it serves correctly routed."""
    from flink_cep_examples_spark.queries.ivf import (
        _assign,
        ivf_compact_index,
        ivf_recluster_index,
        ivf_search_persisted,
        write_ivf_index,
    )

    idx = str(tmp_path / "idx")
    write_ivf_index(spark, sf_small, idx)
    man0 = read_manifest(idx)
    old_cents = {
        int(r.cid): [float(x) for x in r.centroid]
        for r in spark.read.parquet(resolve_tier(idx, "centroids")).collect()
    }
    ivf_recluster_index(spark, idx, k_lists=None)
    man1 = read_manifest(idx)
    assert man1["epoch"] == man0["epoch"] + 1
    assert man1["min_live_epoch"] == man0["min_live_epoch"]

    # the raced batch: assigned against the SUPERSEDED centroids, its
    # ledger row stamped with the PRE-recluster epoch (exactly what a
    # writer that read the manifest just before the publish leaves)
    qvec, new = _twin_vectors(spark, sf_small, 7_100_000)
    _assign(new, old_cents, exact=False).withColumn(
        "batch", F.lit(3)
    ).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("batch", "cid").parquet(f"{idx}/lists_delta")
    spark.createDataFrame(
        [(3, 4, man0["epoch"])], "batch long, n_vecs long, epoch int"
    ).coalesce(1).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("batch").parquet(f"{idx}/ingest_ledger")

    # (a) excluded from serving: no misrouted rows, no partial hits
    served = {
        r.vec_id
        for r in ivf_search_persisted(spark, idx, qvec, top_k=8).collect()
    }
    assert not served & {7_100_000 + i for i in range(4)}

    # (b) the compaction repair: re-assigned against CURRENT centroids
    ivf_compact_index(spark, idx)
    man2 = read_manifest(idx)
    assert 3 in man2["absorbed"]
    assert not os.path.isdir(f"{idx}/lists_delta")
    rows = ivf_search_persisted(spark, idx, qvec, top_k=8).collect()
    ids = {r.vec_id for r in rows}
    assert {7_100_000, 7_100_001} <= ids
    # routing is CORRECT under the new quantizer: the folded twins sit
    # in the same list as vector 0 (nearest-centroid of near-identical
    # vectors), so the pruned probe that finds vec 0 finds them
    by_id = {r.vec_id: r for r in rows}
    assert by_id[7_100_000].cid == by_id[0].cid


def test_rebuild_resets_epoch_and_unblocks_fresh_checkpoint(
    spark, sf_small, tmp_path
):
    """The review's rebuild finding: after stream → compact (absorbed
    retains the batch id) → REBUILD, a brand-new checkpoint's batch 0
    must ingest and serve — the rebuild bumped the epoch and cleared
    absorbed, so neither the skip-guard nor stale delta applies."""
    from flink_cep_examples_spark.queries.text import (
        BM25_QUERY,
        bm25_compact_index,
        bm25_search_persisted,
        write_bm25_index,
    )
    from flink_cep_examples_spark.streaming import bm25_index_stream

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    half_dir = tmp_path / "halfsf"
    half_dir.mkdir()
    docs.limit(100).write.parquet(str(half_dir / "documents.parquet"))
    idx = str(tmp_path / "idx")
    write_bm25_index(spark, str(half_dir), idx)
    e1 = read_manifest(idx)["epoch"]

    def stream_doc(doc_id, tag):
        frame = spark.createDataFrame(
            [(doc_id, " ".join(BM25_QUERY * 4))],
            "doc_id long, text string",
        )
        src = tmp_path / f"src_{tag}"
        frame.coalesce(1).write.parquet(str(src))
        schema = spark.read.parquet(str(src)).schema
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            bm25_index_stream(spark, idx, stream)
            .option("checkpointLocation", str(tmp_path / f"chk_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream timed out"

    stream_doc(9_700_000, "a")  # batch 0 under the first checkpoint
    bm25_compact_index(spark, idx)
    assert read_manifest(idx)["absorbed"] == [0]

    write_bm25_index(spark, str(half_dir), idx)  # the rebuild
    man = read_manifest(idx)
    assert man["epoch"] == e1 + 1 and man["absorbed"] == []
    assert man["min_live_epoch"] == man["epoch"]

    # fresh checkpoint, batch ids restart at 0 — must NOT be skipped
    stream_doc(9_700_111, "b")
    served = {
        r.doc_id
        for r in bm25_search_persisted(spark, idx, BM25_QUERY).collect()
    }
    assert 9_700_111 in served
    assert 9_700_000 not in served  # pre-rebuild content is void


def test_pre_rebuild_ledger_row_is_void_not_served(
    spark, sf_small, tmp_path
):
    """Epoch gate under a FAILED rebuild GC: a stats-ledger row carrying
    a pre-rebuild epoch must not contribute to idf/avgdl even though
    its partitions survived on disk, and the next compaction GCs it."""
    from flink_cep_examples_spark.queries.text import (
        BM25_QUERY,
        _bm25_postings_frame,
        _bm25_stats_frame,
        bm25_compact_index,
        bm25_search_persisted,
        write_bm25_index,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    half_dir = tmp_path / "halfsf"
    half_dir.mkdir()
    docs.limit(100).write.parquet(str(half_dir / "documents.parquet"))
    idx = str(tmp_path / "idx")
    write_bm25_index(spark, str(half_dir), idx)
    man = read_manifest(idx)
    before = {
        r.doc_id: r.score
        for r in bm25_search_persisted(spark, idx, BM25_QUERY).collect()
    }

    # plant a delta batch stamped with a PRE-rebuild epoch (what an
    # interrupted rebuild GC leaves behind)
    stale = spark.createDataFrame(
        [(9_800_000, " ".join(BM25_QUERY * 6))], "doc_id long, text string"
    )
    _bm25_postings_frame(stale).withColumn(
        "batch", F.lit(7)
    ).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("batch", "term_bucket").parquet(f"{idx}/postings_delta")
    _bm25_stats_frame(stale).withColumn("batch", F.lit(7)).withColumn(
        "epoch", F.lit(man["epoch"] - 1)
    ).coalesce(1).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("batch").parquet(f"{idx}/stats_delta")

    after = {
        r.doc_id: r.score
        for r in bm25_search_persisted(spark, idx, BM25_QUERY).collect()
    }
    assert after == before  # void batch: zero effect on scores/stats

    bm25_compact_index(spark, idx)  # GC-only path for void batches
    assert not os.path.isdir(f"{idx}/stats_delta/batch=7")
    assert not os.path.isdir(f"{idx}/postings_delta/batch=7")
    assert read_manifest(idx)["version"] == man["version"]  # no fold
