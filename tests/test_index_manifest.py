"""Round-16 index-lifecycle commit semantics (VERDICT r15 items 2-4):
the versioned-directory + one-atomic-pointer-write manifest commit
(`index_manifest`), the crash window it leaves (exactly one small-file
write), the serve-time gating that closes the BM25 delta tier's
two-write crash window, and the automatic compaction policy."""

from __future__ import annotations

import json
import os

import pytest

pytestmark = pytest.mark.slow  # round-17 driver-budget deselection (VERDICT r16 item 1); round close runs `pytest -m slow`
from pyspark.sql import functions as F

from flink_cep_examples_spark import index_manifest
from flink_cep_examples_spark.index_manifest import (
    publish_manifest,
    read_manifest,
    resolve_tier,
    tier_path,
)
from flink_cep_examples_spark.queries.text import (
    BM25_QUERY,
    _bm25_postings_frame,
    bm25_append_docs,
    bm25_compact_index,
    bm25_search_persisted,
    maybe_compact_bm25,
    write_bm25_index,
)


def _halves(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    cut = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    return docs, docs.filter(F.col("doc_id") <= cut), docs.filter(
        F.col("doc_id") > cut
    )


def _build_half(spark, tmp_path, first, name):
    idx = str(tmp_path / name)
    half_dir = tmp_path / f"halfsf_{name}"
    half_dir.mkdir()
    first.write.parquet(str(half_dir / "documents.parquet"))
    write_bm25_index(spark, str(half_dir), idx)
    return idx


def _served(spark, idx):
    return {
        r.doc_id: r.score
        for r in bm25_search_persisted(spark, idx, BM25_QUERY).collect()
    }


def test_manifest_roundtrip_and_legacy_resolution(tmp_path):
    d = str(tmp_path / "man")
    # no manifest: version 0 = the legacy unversioned layout
    assert read_manifest(d) == {
        "version": 0, "epoch": 0, "min_live_epoch": 0, "absorbed": []
    }
    assert resolve_tier(d, "postings") == f"{d}/postings"
    publish_manifest(d, 3, absorbed=[7, 1], epoch=2, min_live_epoch=1)
    man = read_manifest(d)
    assert man["version"] == 3 and man["absorbed"] == [1, 7]
    assert man["epoch"] == 2 and man["min_live_epoch"] == 1
    assert resolve_tier(d, "postings") == f"{d}/postings_v3"
    # a corrupt manifest degrades to legacy, never crashes readers
    with open(os.path.join(d, index_manifest.MANIFEST_NAME), "w") as f:
        f.write("{not json")
    assert read_manifest(d)["version"] == 0


def test_compaction_crash_before_pointer_write_serves_old_version(
    spark, sf_small, tmp_path, monkeypatch
):
    """THE crash-window pin (VERDICT r15 item 2): kill the compaction
    after it wrote the full next-version layout but BEFORE the single
    manifest pointer write — serving must still read the old version,
    bit-equal, with the delta tier still live. A re-run compaction
    then completes and stays bit-equal."""
    docs, first, second = _halves(spark, sf_small)
    idx = _build_half(spark, tmp_path, first, "crashwin")
    bm25_append_docs(spark, idx, second.select("doc_id", "text"))
    before = _served(spark, idx)
    v_before = read_manifest(idx)["version"]

    def boom(*a, **kw):
        raise RuntimeError("simulated crash at the pointer write")

    monkeypatch.setattr(
        "flink_cep_examples_spark.index_manifest.publish_manifest", boom
    )
    with pytest.raises(RuntimeError, match="pointer write"):
        bm25_compact_index(spark, idx)
    monkeypatch.undo()

    # next-version dirs exist on disk, but the pointer never moved:
    # readers see the OLD consistent snapshot, delta included
    assert os.path.isdir(tier_path(idx, "postings", v_before + 1))
    assert read_manifest(idx)["version"] == v_before
    assert _served(spark, idx) == before

    # recovery is just re-running the compaction
    bm25_compact_index(spark, idx)
    assert read_manifest(idx)["version"] == v_before + 1
    assert _served(spark, idx) == before
    assert not os.path.isdir(f"{idx}/postings_delta")


def test_orphan_postings_batch_never_serves(spark, sf_small, tmp_path):
    """VERDICT r15 item 3 (the delta tier's two-write crash window):
    simulate a writer killed between its postings write and its stats
    write — postings_delta holds a batch with NO stats-ledger row.
    Serving must ignore it entirely: scores, idf, and avgdl match the
    pre-batch index exactly. Compaction leaves the orphan for its
    replay to repair and absorbs nothing from it."""
    docs, first, second = _halves(spark, sf_small)
    idx = _build_half(spark, tmp_path, first, "orphan")
    before = _served(spark, idx)

    # the orphan: postings only, no stats row (the crash state)
    _bm25_postings_frame(second.select("doc_id", "text")).withColumn(
        "batch", F.lit(99)
    ).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("batch", "term_bucket").parquet(f"{idx}/postings_delta")

    assert _served(spark, idx) == before  # idf/avgdl untouched

    # compaction: nothing ledgered -> no-op, orphan left for replay
    v = read_manifest(idx)["version"]
    bm25_compact_index(spark, idx)
    assert read_manifest(idx)["version"] == v
    assert os.path.isdir(f"{idx}/postings_delta/batch=99")
    assert _served(spark, idx) == before

    # the repair: the "replay" lands the stats row (same batch id) —
    # the batch goes live and serving now reflects the full corpus
    from flink_cep_examples_spark.queries.text import _bm25_stats_frame

    _bm25_stats_frame(second.select("doc_id", "text")).withColumn(
        "batch", F.lit(99)
    ).coalesce(1).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("batch").parquet(f"{idx}/stats_delta")
    from flink_cep_examples_spark.queries import QUERIES, load_all

    load_all()
    scan = {
        r.doc_id: r.score
        for r in QUERIES["docs_bm25_topk"](spark, sf_small).collect()
    }
    assert _served(spark, idx) == scan


def test_maybe_compact_policy(spark, sf_small, tmp_path):
    """VERDICT r15 item 4: the automatic compaction policy compacts
    exactly when the LIVE delta batch count crosses the threshold —
    below it nothing happens, at it exactly one compaction runs, and
    serving is bit-equal throughout."""
    docs, first, second = _halves(spark, sf_small)
    idx = _build_half(spark, tmp_path, first, "policy")
    parts = second.randomSplit([1.0, 1.0, 1.0], seed=7)
    full = _served(spark, idx)

    for i, p in enumerate(parts):
        bm25_append_docs(spark, idx, p.select("doc_id", "text"))
        compacted = maybe_compact_bm25(spark, idx, max_delta_batches=3)
        assert compacted == (i == 2)  # fires exactly at the threshold
    assert not os.path.isdir(f"{idx}/postings_delta")
    assert read_manifest(idx)["version"] == 2  # build + one compaction

    # bit-equal to the scan path over the whole corpus
    from flink_cep_examples_spark.queries import QUERIES, load_all

    load_all()
    scan = {
        r.doc_id: r.score
        for r in QUERIES["docs_bm25_topk"](spark, sf_small).collect()
    }
    served = _served(spark, idx)
    assert served == scan
    assert set(served) == set(full) or len(served) >= len(full)


def test_append_retry_is_idempotent(spark, sf_small, tmp_path):
    """ADVICE r15 (text.py append): the content-keyed delta batch id
    makes a retried append overwrite its OWN partitions — counts and
    scores identical after a double call."""
    docs, first, second = _halves(spark, sf_small)
    idx = _build_half(spark, tmp_path, first, "retry")
    batch = second.select("doc_id", "text")
    bm25_append_docs(spark, idx, batch)
    once = _served(spark, idx)
    n_rows = spark.read.parquet(f"{idx}/postings_delta").count()
    n_ledger = spark.read.parquet(f"{idx}/stats_delta").count()
    bm25_append_docs(spark, idx, batch)  # the retry
    assert spark.read.parquet(f"{idx}/postings_delta").count() == n_rows
    assert spark.read.parquet(f"{idx}/stats_delta").count() == n_ledger
    assert _served(spark, idx) == once


def test_absorbed_replay_guard_skips_rewrite(spark, sf_small, tmp_path):
    """A compaction can run against a batch whose checkpoint commit
    never landed: the replay re-delivers identical content, and the
    ingest guard must SKIP the re-write (the content already lives in
    the compacted base) — no delta partitions reappear, serving
    unchanged."""
    from flink_cep_examples_spark.streaming import bm25_index_stream

    docs, first, second = _halves(spark, sf_small)
    idx = _build_half(spark, tmp_path, first, "replayguard")
    src = tmp_path / "src_rg"
    src.mkdir()
    second.coalesce(1).write.parquet(str(src / "p1"))
    schema = spark.read.parquet(str(src / "p1")).schema
    stream = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    ).parquet(str(src))
    q = (
        bm25_index_stream(spark, idx, stream)
        .option("checkpointLocation", str(tmp_path / "chk_rg"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream timed out"
    bm25_compact_index(spark, idx)
    absorbed = read_manifest(idx)["absorbed"]
    assert absorbed  # the streamed batch was absorbed and remembered
    served = _served(spark, idx)

    # replay the absorbed batch through a fresh stream run over the
    # same source with a NEW checkpoint: batch id 0 is reused with
    # identical content -> the guard must skip the write
    stream2 = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    ).parquet(str(src))
    q2 = (
        bm25_index_stream(spark, idx, stream2)
        .option("checkpointLocation", str(tmp_path / "chk_rg2"))
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(180), "stream timed out"
    assert not os.path.isdir(f"{idx}/postings_delta")
    assert _served(spark, idx) == served


def test_stream_auto_compaction_bounds_delta(spark, sf_small, tmp_path):
    """bm25_index_stream(max_delta_batches=N): the ingest tail runs
    the policy, so a multi-batch stream leaves at most N-1 live delta
    batches behind and serving stays bit-equal to the scan path."""
    from flink_cep_examples_spark.queries import QUERIES, load_all
    from flink_cep_examples_spark.streaming import bm25_index_stream

    load_all()
    docs, first, second = _halves(spark, sf_small)
    idx = _build_half(spark, tmp_path, first, "autocompact")
    src = tmp_path / "src_ac"
    src.mkdir()
    cut2 = second.approxQuantile("doc_id", [0.5], 0.0)[0]
    second.filter(F.col("doc_id") <= cut2).coalesce(1).write.parquet(
        str(src / "p1")
    )
    second.filter(F.col("doc_id") > cut2).coalesce(1).write.parquet(
        str(src / "p2")
    )
    schema = spark.read.parquet(str(src / "p1")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        bm25_index_stream(spark, idx, stream, max_delta_batches=2)
        .option("checkpointLocation", str(tmp_path / "chk_ac"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream timed out"
    # two file-batches at threshold 2 -> at least one compaction fired
    assert read_manifest(idx)["version"] >= 2
    scan = {
        r.doc_id: r.score
        for r in QUERIES["docs_bm25_topk"](spark, sf_small).collect()
    }
    assert _served(spark, idx) == scan


def test_ivf_recluster_crash_before_pointer_serves_old_quantizer(
    spark, sf_small, tmp_path, monkeypatch
):
    """IVF twin of the compaction crash-window pin: a recluster killed
    before its pointer write leaves the OLD centroids/lists pairing
    live — searches are unchanged — and a re-run completes the swap."""
    from flink_cep_examples_spark.queries.ivf import (
        ivf_recluster_index,
        ivf_search_persisted,
        write_ivf_index,
    )

    idx = str(tmp_path / "ivf_crash")
    write_ivf_index(spark, sf_small, idx)
    src = (
        spark.read.parquet(f"{sf_small}/embeddings.parquet")
        .filter("vec_id = 0")
        .first()
    )
    qvec = [float(x) for x in src.embedding]
    before = [
        (r.vec_id, round(r.cos, 9))
        for r in ivf_search_persisted(spark, idx, qvec).collect()
    ]
    k_before = spark.read.parquet(resolve_tier(idx, "centroids")).count()

    def boom(*a, **kw):
        raise RuntimeError("simulated crash at the pointer write")

    monkeypatch.setattr(
        "flink_cep_examples_spark.index_manifest.publish_manifest", boom
    )
    with pytest.raises(RuntimeError, match="pointer write"):
        ivf_recluster_index(spark, idx, k_lists=None)
    monkeypatch.undo()

    assert (
        spark.read.parquet(resolve_tier(idx, "centroids")).count()
        == k_before
    )
    after = [
        (r.vec_id, round(r.cos, 9))
        for r in ivf_search_persisted(spark, idx, qvec).collect()
    ]
    assert after == before

    ivf_recluster_index(spark, idx, k_lists=None)  # recovery: re-run
    assert read_manifest(idx)["version"] == 2
    rows = ivf_search_persisted(spark, idx, qvec, top_k=3).collect()
    assert rows and rows[0].vec_id == 0 and abs(rows[0].cos - 1.0) < 1e-9


def test_stage_boundary_versions_keep_held_frames_consistent(
    spark, sf_small
):
    """VERDICT r15 item 5: the ingest stage boundary uses the same
    versioned-write + pointer commit as the index lifecycle. A frame
    returned by one materialization must stay consistent after a
    LATER re-materialization (each run writes an immutable version
    subdir; the old frame keeps scanning its own pinned version
    instead of racing an in-place overwrite)."""
    from flink_cep_examples_spark.queries.pipeline import (
        _materialize_stage,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "lang"
    )
    first = _materialize_stage(docs.limit(40), sf_small, "mantest")
    n_first = first.count()
    assert n_first == 40
    # re-materialize with DIFFERENT content — the held frame must not
    # see it
    second = _materialize_stage(docs.limit(10), sf_small, "mantest")
    assert second.count() == 10
    assert first.count() == n_first  # pinned version, not the new one
    # the two frames root at different immutable version dirs
    p1 = first._jdf.queryExecution().executedPlan().toString()
    p2 = second._jdf.queryExecution().executedPlan().toString()
    assert "data_v1" in p1 and "data_v2" in p2


def test_manifest_pointer_is_single_small_file(tmp_path):
    """The commit's entire crash window is one small-file replace: the
    manifest is one line of JSON, and a publish leaves no temp file."""
    d = str(tmp_path / "ptr")
    publish_manifest(d, 1, absorbed=[4])
    entries = os.listdir(d)
    assert entries == [index_manifest.MANIFEST_NAME]
    with open(os.path.join(d, index_manifest.MANIFEST_NAME)) as f:
        content = f.read()
    assert "\n" not in content.strip()
    assert json.loads(content) == {
        "version": 1, "epoch": 0, "min_live_epoch": 0, "absorbed": [4]
    }
