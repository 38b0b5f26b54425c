"""Incremental BM25 ingest (round 15): appended docs' postings join
their frozen term buckets without rewriting existing files, the stats
delta rows keep corpus-level n_docs/total_dl exact, and serving off the
half-built-then-appended index is BIT-IDENTICAL to the full-corpus scan
path — the agreement the shared ``_bm25_rank`` kernel guarantees."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_cep_examples_spark.index_manifest import resolve_tier
from flink_cep_examples_spark.queries.text import (
    BM25_QUERY,
    bm25_append_docs,
    bm25_search_persisted,
    write_bm25_index,
)


def _half_split(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    cut = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    return docs, docs.filter(F.col("doc_id") <= cut), docs.filter(
        F.col("doc_id") > cut
    )


def test_bm25_append_matches_full_rebuild(spark, sf_small, tmp_path):
    """Build the index from HALF the corpus, append the other half,
    and serve: scores must be bit-equal to the scan path over the FULL
    corpus (docs_bm25_topk's tier) — idf, avgdl, and df all absorbed
    the appended docs exactly as a rebuild would."""
    from flink_cep_examples_spark.queries import QUERIES, load_all

    load_all()
    docs, first, second = _half_split(spark, sf_small)
    idx = str(tmp_path / "bm25_half")

    # build from the first half via the documents loader contract:
    # write_bm25_index reads `documents` from a dir, so stage the half
    half_dir = tmp_path / "halfsf"
    half_dir.mkdir()
    first.write.parquet(str(half_dir / "documents.parquet"))
    write_bm25_index(spark, str(half_dir), idx)

    n_post_before = spark.read.parquet(resolve_tier(idx, "postings")).count()
    bm25_append_docs(spark, idx, second.select("doc_id", "text"))
    # round 16: appends land in the batch-keyed DELTA tier (replay-
    # idempotent), never touching the published base version
    assert (
        spark.read.parquet(resolve_tier(idx, "postings")).count()
        == n_post_before
    )
    assert spark.read.parquet(f"{idx}/postings_delta").count() > 0
    stats_rows = spark.read.parquet(resolve_tier(idx, "stats")).collect()
    assert len(stats_rows) == 1  # base build row
    delta_rows = spark.read.parquet(f"{idx}/stats_delta").collect()
    assert len(delta_rows) == 1  # one ledger row per append batch
    assert (
        sum(r.n_docs for r in stats_rows + delta_rows) == docs.count()
    )

    served = {
        r.doc_id: r for r in bm25_search_persisted(
            spark, idx, BM25_QUERY
        ).collect()
    }
    scan = {
        r.doc_id: r
        for r in QUERIES["docs_bm25_topk"](spark, sf_small).collect()
    }
    assert set(served) == set(scan)
    for doc_id, s in served.items():
        assert s.score == scan[doc_id].score, doc_id  # bit-equal doubles
        assert s.dl == scan[doc_id].dl, doc_id


def test_bm25_append_stats_sum_and_pruning(spark, sf_small, tmp_path):
    """After an append, (a) the served plan still partition-prunes to
    the query terms' buckets (the frozen bucket hash routes appended
    postings into the SAME buckets), and (b) a second append keeps the
    stats ledger exact — three rows summing to the total ingested."""
    docs, first, second = _half_split(spark, sf_small)
    idx = str(tmp_path / "bm25_inc")
    half_dir = tmp_path / "halfsf"
    half_dir.mkdir()
    first.write.parquet(str(half_dir / "documents.parquet"))
    write_bm25_index(spark, str(half_dir), idx)

    cut2 = second.approxQuantile("doc_id", [0.5], 0.0)[0]
    bm25_append_docs(
        spark,
        idx,
        second.filter(F.col("doc_id") <= cut2).select("doc_id", "text"),
    )
    bm25_append_docs(
        spark,
        idx,
        second.filter(F.col("doc_id") > cut2).select("doc_id", "text"),
    )
    stats_rows = spark.read.parquet(resolve_tier(idx, "stats")).collect()
    delta_rows = spark.read.parquet(f"{idx}/stats_delta").collect()
    assert len(stats_rows) == 1 and len(delta_rows) == 2
    stats_rows = stats_rows + delta_rows
    assert sum(r.n_docs for r in stats_rows) == docs.count()
    tok = F.size(F.split(F.trim("text"), r"\s+"))
    assert sum(r.total_dl for r in stats_rows) == (
        docs.select(F.sum(tok)).first()[0]
    )

    out = bm25_search_persisted(spark, idx, BM25_QUERY)
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("term_bucket" in l for l in scan_lines), scan_lines
    assert out.count() > 0


def test_bm25_index_stream_serves_streamed_docs(spark, sf_small, tmp_path):
    """bm25_index_stream (round 15): stream the second half of the
    corpus into an index built from the first half (two micro-batches
    via availableNow file replay); serving must then be bit-equal to
    the full-corpus scan path — the delta tier's postings/stats absorb
    into the same idf/avgdl arithmetic. Then REPLAY one batch's write
    (simulating a foreachBatch retry) and pin idempotency: the index
    is unchanged."""
    from flink_cep_examples_spark.queries import QUERIES, load_all
    from flink_cep_examples_spark.streaming import bm25_index_stream

    load_all()
    docs, first, second = _half_split(spark, sf_small)
    idx = str(tmp_path / "bm25_streamed")
    half_dir = tmp_path / "halfsf"
    half_dir.mkdir()
    first.write.parquet(str(half_dir / "documents.parquet"))
    write_bm25_index(spark, str(half_dir), idx)

    src = tmp_path / "src"
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
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(str(src))
    )
    q = (
        bm25_index_stream(spark, idx, stream)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), 'stream timed out'

    served = {
        r.doc_id: r for r in bm25_search_persisted(
            spark, idx, BM25_QUERY
        ).collect()
    }
    scan = {
        r.doc_id: r
        for r in QUERIES["docs_bm25_topk"](spark, sf_small).collect()
    }
    assert set(served) == set(scan)
    for doc_id, s in served.items():
        assert s.score == scan[doc_id].score, doc_id

    batches = {
        r.batch
        for r in spark.read.parquet(f"{idx}/postings_delta")
        .select("batch")
        .distinct()
        .collect()
    }
    assert len(batches) >= 2  # maxFilesPerTrigger=1 → one batch per file

    # replay idempotency: re-run a batch's write body with the SAME
    # batch id and the SAME content (what a foreachBatch retry
    # redelivers) — dynamic overwrite of its own partitions, counts flat
    n_post = spark.read.parquet(f"{idx}/postings_delta").count()
    stats_sum = sum(
        r.n_docs
        for r in spark.read.parquet(f"{idx}/stats_delta").collect()
    )
    from flink_cep_examples_spark.queries.text import (
        _bm25_postings_frame,
        _bm25_stats_frame,
    )

    # batch 0's exact redelivered content = the docs it recorded
    b0_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{idx}/postings_delta")
        .filter("batch = 0")
        .select("doc_id")
        .distinct()
        .collect()
    }
    replay = second.filter(
        F.col("doc_id").isin(list(b0_ids))
    ).select("doc_id", "text")
    _bm25_postings_frame(replay).withColumn(
        "batch", F.lit(0)
    ).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("batch", "term_bucket").parquet(f"{idx}/postings_delta")
    _bm25_stats_frame(replay).withColumn("batch", F.lit(0)).coalesce(
        1
    ).write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("batch").parquet(f"{idx}/stats_delta")
    assert spark.read.parquet(f"{idx}/postings_delta").count() == n_post
    assert (
        sum(
            r.n_docs
            for r in spark.read.parquet(f"{idx}/stats_delta").collect()
        )
        == stats_sum
    )
    served2 = {
        r.doc_id: r.score
        for r in bm25_search_persisted(spark, idx, BM25_QUERY).collect()
    }
    assert served2 == {d: s.score for d, s in served.items()}


def test_bm25_index_stream_restart_from_checkpoint(
    spark, sf_small, tmp_path
):
    """Checkpoint-restart of the online indexer (round 15, the
    ingest-pipeline restart pin's pattern): stream PART of the
    arriving docs, STOP, add the rest, restart a NEW query from the
    SAME checkpoint. The committed batch must not re-ingest (the
    stats ledger counts every arriving doc exactly once) and serving
    off the final index is bit-equal to the full-corpus scan path."""
    from flink_cep_examples_spark.queries import QUERIES, load_all
    from flink_cep_examples_spark.streaming import bm25_index_stream

    load_all()
    docs, first, second = _half_split(spark, sf_small)
    idx = str(tmp_path / "bm25_restart")
    half_dir = tmp_path / "halfsf"
    half_dir.mkdir()
    first.write.parquet(str(half_dir / "documents.parquet"))
    write_bm25_index(spark, str(half_dir), idx)

    src = tmp_path / "src"
    src.mkdir()
    chk = str(tmp_path / "chk")
    cut2 = second.approxQuantile("doc_id", [0.5], 0.0)[0]
    second.filter(F.col("doc_id") <= cut2).coalesce(1).write.parquet(
        str(src / "p1")
    )
    schema = spark.read.parquet(str(src / "p1")).schema

    def run_once() -> None:
        stream = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(src))
        q = (
            bm25_index_stream(spark, idx, stream)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), 'stream timed out'

    run_once()
    n_docs_mid = sum(
        r.n_docs
        for r in spark.read.parquet(f"{idx}/stats_delta").collect()
    )
    assert n_docs_mid == second.filter(F.col("doc_id") <= cut2).count()

    second.filter(F.col("doc_id") > cut2).coalesce(1).write.parquet(
        str(src / "p2")
    )
    run_once()

    n_docs_final = sum(
        r.n_docs
        for r in spark.read.parquet(f"{idx}/stats_delta").collect()
    )
    assert n_docs_final == second.count()  # nothing re-ingested

    served = {
        r.doc_id: r.score
        for r in bm25_search_persisted(spark, idx, BM25_QUERY).collect()
    }
    scan = {
        r.doc_id: r.score
        for r in QUERIES["docs_bm25_topk"](spark, sf_small).collect()
    }
    assert served == scan  # bit-equal doubles


def test_bm25_compact_absorbs_delta_bit_equal(spark, sf_small, tmp_path):
    """bm25_compact_index (round 15): after streaming docs into the
    delta tier, compaction merges both tiers into a fresh base layout,
    removes the delta directories, folds the stats ledger to one row —
    and serving is BIT-EQUAL before and after (search already unions
    the tiers; compaction changes layout, never arithmetic). Pruning
    still applies to the compacted layout."""
    import os

    from flink_cep_examples_spark.queries.text import bm25_compact_index
    from flink_cep_examples_spark.streaming import bm25_index_stream

    docs, first, second = _half_split(spark, sf_small)
    idx = str(tmp_path / "bm25_compact")
    half_dir = tmp_path / "halfsf"
    half_dir.mkdir()
    first.write.parquet(str(half_dir / "documents.parquet"))
    write_bm25_index(spark, str(half_dir), idx)

    src = tmp_path / "src"
    src.mkdir()
    second.coalesce(1).write.parquet(str(src / "p1"))
    schema = spark.read.parquet(str(src / "p1")).schema
    stream = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    ).parquet(str(src))
    q = (
        bm25_index_stream(spark, idx, stream)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), 'stream timed out'

    before = {
        r.doc_id: r.score
        for r in bm25_search_persisted(spark, idx, BM25_QUERY).collect()
    }
    n_total = spark.read.parquet(resolve_tier(idx, "postings")).count() + (
        spark.read.parquet(f"{idx}/postings_delta").count()
    )
    bm25_compact_index(spark, idx)
    assert not os.path.isdir(f"{idx}/postings_delta")
    assert not os.path.isdir(f"{idx}/stats_delta")
    assert (
        spark.read.parquet(resolve_tier(idx, "postings")).count() == n_total
    )
    stats_rows = spark.read.parquet(resolve_tier(idx, "stats")).collect()
    assert len(stats_rows) == 1 and stats_rows[0].n_docs == docs.count()

    out = bm25_search_persisted(spark, idx, BM25_QUERY)
    after = {r.doc_id: r.score for r in out.collect()}
    assert after == before  # bit-equal doubles
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("term_bucket" in l for l in scan_lines), scan_lines

    v_before = resolve_tier(idx, "postings")
    bm25_compact_index(spark, idx)  # second call: no delta -> no-op
    assert resolve_tier(idx, "postings") == v_before  # no new version
    assert spark.read.parquet(v_before).count() == n_total
