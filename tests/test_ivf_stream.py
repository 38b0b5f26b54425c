"""Online IVF vector ingest (round 16): the vector twin of the BM25
delta tier — streamed embeddings land in batch-keyed, ledger-gated
delta partitions, serve immediately off the base ∪ live-delta union,
and fold back into the base via the manifest-committed compaction.
Mirrors tests/test_bm25_append.py's coverage for the lexical side."""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.slow  # round-17 driver-budget deselection (VERDICT r16 item 1); round close runs `pytest -m slow`
from pyspark.sql import functions as F

from flink_cep_examples_spark.index_manifest import (
    read_manifest,
    resolve_tier,
)
from flink_cep_examples_spark.queries.ivf import (
    ivf_compact_index,
    ivf_ingest_batch,
    ivf_search_persisted,
    maybe_compact_ivf,
    write_ivf_index,
)


def _twin_vectors(spark, sf_small, n=4):
    """n near-copies of vector 0 under fresh ids — they must assign to
    vector 0's list and dominate a search aimed at it."""
    src = (
        spark.read.parquet(f"{sf_small}/embeddings.parquet")
        .filter("vec_id = 0")
        .first()
    )
    qvec = [float(x) for x in src.embedding]
    rows = [
        (7_000_000 + i, src.label, [v + (i + 1) * 1e-4 for v in qvec])
        for i in range(n)
    ]
    return qvec, spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )


def _stream_in(spark, idx, frame, src_dir, chk_dir, **kw):
    from flink_cep_examples_spark.streaming import ivf_index_stream

    frame.coalesce(1).write.mode("append").parquet(str(src_dir))
    schema = spark.read.parquet(str(src_dir)).schema
    stream = spark.readStream.schema(schema).parquet(str(src_dir))
    q = (
        ivf_index_stream(spark, idx, stream, **kw)
        .option("checkpointLocation", str(chk_dir))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream timed out"


def test_ivf_stream_serves_streamed_vectors(spark, sf_small, tmp_path):
    idx = str(tmp_path / "idx")
    write_ivf_index(spark, sf_small, idx)
    n0 = spark.read.parquet(resolve_tier(idx, "lists")).count()
    qvec, new = _twin_vectors(spark, sf_small)
    _stream_in(spark, idx, new, tmp_path / "src", tmp_path / "chk")

    # base untouched; delta tier ledgered
    assert spark.read.parquet(resolve_tier(idx, "lists")).count() == n0
    ledger = spark.read.parquet(f"{idx}/ingest_ledger").collect()
    assert sum(r.n_vecs for r in ledger) == 4

    hits = ivf_search_persisted(spark, idx, qvec, top_k=6)
    plan = hits._jdf.queryExecution().executedPlan().toString()
    scan_lines = [
        l for l in plan.splitlines() if "PartitionFilters" in l
    ]
    assert any("cid" in l for l in scan_lines), scan_lines
    # the delta scan prunes on BOTH partition columns: its live-batch
    # isin plus the probe-cid isin reach the reader as PartitionFilters
    assert any("batch" in l and "cid" in l for l in scan_lines), scan_lines
    rows = hits.collect()
    ids = {r.vec_id for r in rows}
    assert {7_000_000, 7_000_001, 7_000_002, 7_000_003} <= ids
    assert rows[0].vec_id == 0  # the exact vector still leads
    by_id = {r.vec_id: r.cos for r in rows}
    assert by_id[7_000_000] > 0.999999


def test_ivf_stream_replay_idempotent(spark, sf_small, tmp_path):
    """Re-running a batch's ingest body with the SAME id and content
    (a foreachBatch retry) overwrites its own partitions — counts and
    serving unchanged."""
    idx = str(tmp_path / "idx")
    write_ivf_index(spark, sf_small, idx)
    qvec, new = _twin_vectors(spark, sf_small)
    _stream_in(spark, idx, new, tmp_path / "src", tmp_path / "chk")
    n_delta = spark.read.parquet(f"{idx}/lists_delta").count()
    served = [
        (r.vec_id, r.cos)
        for r in ivf_search_persisted(spark, idx, qvec).collect()
    ]
    ivf_ingest_batch(spark, idx, new, 0, exact=False)  # the replay
    assert spark.read.parquet(f"{idx}/lists_delta").count() == n_delta
    assert [
        (r.vec_id, r.cos)
        for r in ivf_search_persisted(spark, idx, qvec).collect()
    ] == served


def test_ivf_stream_restart_from_checkpoint(spark, sf_small, tmp_path):
    """A committed batch must not re-ingest on restart: the ledger
    counts every arriving vector exactly once."""
    idx = str(tmp_path / "idx")
    write_ivf_index(spark, sf_small, idx)
    qvec, new = _twin_vectors(spark, sf_small, n=6)
    first = new.filter("vec_id < 7000003")
    second = new.filter("vec_id >= 7000003")
    _stream_in(spark, idx, first, tmp_path / "src", tmp_path / "chk")
    assert (
        sum(
            r.n_vecs
            for r in spark.read.parquet(f"{idx}/ingest_ledger").collect()
        )
        == 3
    )
    _stream_in(spark, idx, second, tmp_path / "src", tmp_path / "chk")
    assert (
        sum(
            r.n_vecs
            for r in spark.read.parquet(f"{idx}/ingest_ledger").collect()
        )
        == 6
    )
    ids = {
        r.vec_id
        for r in ivf_search_persisted(spark, idx, qvec, top_k=8).collect()
    }
    assert {7_000_000 + i for i in range(6)} <= ids


def test_ivf_orphan_delta_batch_never_serves(spark, sf_small, tmp_path):
    """The two-write window, vector side: lists_delta rows with no
    ledger row (writer killed between the writes) must not serve;
    landing the ledger row (the replay's effect) makes them live."""
    idx = str(tmp_path / "idx")
    write_ivf_index(spark, sf_small, idx)
    qvec, new = _twin_vectors(spark, sf_small)
    before = [
        (r.vec_id, r.cos)
        for r in ivf_search_persisted(spark, idx, qvec).collect()
    ]
    # the orphan: vectors only, no ledger row
    from flink_cep_examples_spark.queries.ivf import _assign

    cents = {
        int(r.cid): [float(x) for x in r.centroid]
        for r in spark.read.parquet(resolve_tier(idx, "centroids")).collect()
    }
    _assign(new, cents, exact=False).withColumn(
        "batch", F.lit(5)
    ).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("batch", "cid").parquet(f"{idx}/lists_delta")

    assert [
        (r.vec_id, r.cos)
        for r in ivf_search_persisted(spark, idx, qvec).collect()
    ] == before  # orphan invisible

    # compaction is a no-op on an orphan-only delta
    v = read_manifest(idx)["version"]
    ivf_compact_index(spark, idx)
    assert read_manifest(idx)["version"] == v
    assert os.path.isdir(f"{idx}/lists_delta/batch=5")

    # the repair: the ledger row lands -> the batch goes live
    spark.createDataFrame(
        [(5, 4)], "batch long, n_vecs long"
    ).coalesce(1).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("batch").parquet(f"{idx}/ingest_ledger")
    ids = {
        r.vec_id
        for r in ivf_search_persisted(spark, idx, qvec, top_k=6).collect()
    }
    assert {7_000_000, 7_000_001} <= ids


def test_ivf_compact_absorbs_delta_bit_equal(spark, sf_small, tmp_path):
    idx = str(tmp_path / "idx")
    write_ivf_index(spark, sf_small, idx)
    qvec, new = _twin_vectors(spark, sf_small)
    _stream_in(spark, idx, new, tmp_path / "src", tmp_path / "chk")
    before = [
        (r.vec_id, r.cos)
        for r in ivf_search_persisted(spark, idx, qvec).collect()
    ]
    n_total = spark.read.parquet(resolve_tier(idx, "lists")).count() + (
        spark.read.parquet(f"{idx}/lists_delta").count()
    )
    v = read_manifest(idx)["version"]
    ivf_compact_index(spark, idx)
    man = read_manifest(idx)
    assert man["version"] == v + 1
    assert man["absorbed"] == [0]  # the streamed batch, remembered
    assert not os.path.isdir(f"{idx}/lists_delta")
    assert not os.path.isdir(f"{idx}/ingest_ledger")
    assert (
        spark.read.parquet(resolve_tier(idx, "lists")).count() == n_total
    )
    after = [
        (r.vec_id, r.cos)
        for r in ivf_search_persisted(spark, idx, qvec).collect()
    ]
    assert after == before  # bit-equal doubles
    ivf_compact_index(spark, idx)  # no delta -> no-op
    assert read_manifest(idx)["version"] == v + 1


def test_ivf_compact_crash_before_pointer_serves_old(
    spark, sf_small, tmp_path, monkeypatch
):
    """IVF-compaction crash-window pin: killed at the pointer write,
    the old version (plus live delta) keeps serving bit-equal; a
    re-run completes."""
    idx = str(tmp_path / "idx")
    write_ivf_index(spark, sf_small, idx)
    qvec, new = _twin_vectors(spark, sf_small)
    _stream_in(spark, idx, new, tmp_path / "src", tmp_path / "chk")
    before = [
        (r.vec_id, r.cos)
        for r in ivf_search_persisted(spark, idx, qvec).collect()
    ]
    v = read_manifest(idx)["version"]

    def boom(*a, **kw):
        raise RuntimeError("simulated crash at the pointer write")

    monkeypatch.setattr(
        "flink_cep_examples_spark.index_manifest.publish_manifest", boom
    )
    with pytest.raises(RuntimeError, match="pointer write"):
        ivf_compact_index(spark, idx)
    monkeypatch.undo()
    assert read_manifest(idx)["version"] == v
    assert [
        (r.vec_id, r.cos)
        for r in ivf_search_persisted(spark, idx, qvec).collect()
    ] == before
    ivf_compact_index(spark, idx)
    assert read_manifest(idx)["version"] == v + 1
    assert [
        (r.vec_id, r.cos)
        for r in ivf_search_persisted(spark, idx, qvec).collect()
    ] == before


def test_ivf_recluster_absorbs_live_delta(spark, sf_small, tmp_path):
    """A recluster must retrain over base ∪ LIVE delta and absorb the
    streamed batches — streamed vectors survive the swap and keep
    serving off the retrained quantizer."""
    from flink_cep_examples_spark.queries.ivf import ivf_recluster_index

    idx = str(tmp_path / "idx")
    write_ivf_index(spark, sf_small, idx)
    n0 = spark.read.parquet(resolve_tier(idx, "lists")).count()
    qvec, new = _twin_vectors(spark, sf_small)
    _stream_in(spark, idx, new, tmp_path / "src", tmp_path / "chk")
    ivf_recluster_index(spark, idx, k_lists=None)
    man = read_manifest(idx)
    assert man["absorbed"] == [0]
    assert not os.path.isdir(f"{idx}/lists_delta")
    assert (
        spark.read.parquet(resolve_tier(idx, "lists")).count() == n0 + 4
    )
    ids = {
        r.vec_id
        for r in ivf_search_persisted(spark, idx, qvec, top_k=6).collect()
    }
    assert {7_000_000, 7_000_001} <= ids


def test_hybrid_serves_freshly_streamed_content(spark, sf_small, tmp_path):
    """End-to-end freshness pin across BOTH retrieval arms (round 16):
    a new document streamed into the BM25 delta tier AND its embedding
    streamed into the IVF delta tier must surface — immediately, with
    no rebuild or compaction — through the fused hybrid ranking (the
    shared rrf_fuse kernel over the two persisted, delta-aware serve
    paths). This is the production RAG-ingest contract: content is
    retrievable the moment both index writes land."""
    from flink_cep_examples_spark.queries.similarity import rrf_fuse
    from flink_cep_examples_spark.queries.text import (
        BM25_QUERY,
        bm25_search_persisted,
        write_bm25_index,
    )
    from flink_cep_examples_spark.streaming import (
        bm25_index_stream,
        ivf_index_stream,
    )

    new_id = 9_500_000
    # lexical index over the real corpus
    bm25_dir = str(tmp_path / "bm25")
    write_bm25_index(spark, sf_small, bm25_dir)
    # vector index over the real corpus
    ivf_dir = str(tmp_path / "ivf")
    write_ivf_index(spark, sf_small, ivf_dir)
    qvec, _ = _twin_vectors(spark, sf_small)

    # stream the new doc into BOTH arms: text stuffed with the query
    # terms (tops BM25), embedding a near-twin of the query vector
    # (tops cosine)
    doc = spark.createDataFrame(
        [(new_id, " ".join(BM25_QUERY * 4))], "doc_id long, text string"
    )
    doc.coalesce(1).write.parquet(str(tmp_path / "dsrc"))
    dschema = spark.read.parquet(str(tmp_path / "dsrc")).schema
    q1 = (
        bm25_index_stream(
            spark,
            bm25_dir,
            spark.readStream.schema(dschema).parquet(str(tmp_path / "dsrc")),
        )
        .option("checkpointLocation", str(tmp_path / "dchk"))
        .trigger(availableNow=True)
        .start()
    )
    assert q1.awaitTermination(300), "doc stream timed out"
    vec = spark.createDataFrame(
        [(new_id, 0, [v + 1e-5 for v in qvec])],
        "vec_id long, label int, embedding array<float>",
    )
    vec.coalesce(1).write.parquet(str(tmp_path / "vsrc"))
    vschema = spark.read.parquet(str(tmp_path / "vsrc")).schema
    q2 = (
        ivf_index_stream(
            spark,
            ivf_dir,
            spark.readStream.schema(vschema).parquet(str(tmp_path / "vsrc")),
        )
        .option("checkpointLocation", str(tmp_path / "vchk"))
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(300), "vector stream timed out"

    lex = bm25_search_persisted(spark, bm25_dir, BM25_QUERY).select(
        "doc_id", "score"
    )
    sem = ivf_search_persisted(spark, ivf_dir, qvec).select(
        F.col("vec_id").alias("doc_id"), "cos"
    )
    fused = rrf_fuse(lex, sem).collect()
    assert fused[0].doc_id == new_id, [r.doc_id for r in fused[:5]]


def test_ivf_stream_auto_compaction(spark, sf_small, tmp_path):
    """maybe_compact_ivf wired into the stream tail bounds the delta
    tier; serving stays correct through the triggered compaction."""
    idx = str(tmp_path / "idx")
    write_ivf_index(spark, sf_small, idx)
    qvec, new = _twin_vectors(spark, sf_small, n=6)
    # two single-file batches at threshold 2 -> one compaction fires
    src = tmp_path / "src"
    first = new.filter("vec_id < 7000003")
    second = new.filter("vec_id >= 7000003")
    from flink_cep_examples_spark.streaming import ivf_index_stream

    first.coalesce(1).write.mode("append").parquet(str(src))
    second.coalesce(1).write.mode("append").parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        ivf_index_stream(spark, idx, stream, max_delta_batches=2)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream timed out"
    assert read_manifest(idx)["version"] >= 2  # a compaction fired
    assert maybe_compact_ivf(spark, idx, max_delta_batches=2) is False
    ids = {
        r.vec_id
        for r in ivf_search_persisted(spark, idx, qvec, top_k=8).collect()
    }
    assert {7_000_000 + i for i in range(6)} <= ids
