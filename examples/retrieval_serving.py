"""Round-14 retrieval-serving story: train the IVF index ONCE, then
serve everything off it — the train-once/serve-many shape a production
retrieval tier runs (north-star extension beyond the reference's CEP
scope):

  1. index build       — coarse quantizer trained + corpus written
                         clustered by cid (write_ivf_index via the
                         ensure_ivf_index train-once guard)
  2. batched serving   — a 3-query batch answered off ONE
                         partition-pruned scan of the union of probe
                         lists (ann_serve_many_persisted_topk)
  3. diversified top-k — MMR reranking over the pruned candidate
                         stage, no training action at serve time
                         (ann_mmr_ivf_persisted_topk)
  4. hybrid fusion     — BM25 lexical arm + cosine semantic arm fused
                         by reciprocal-rank fusion (docs_hybrid_rrf_topk)
  5. online serving    — the same kernel behind a foreachBatch stream:
                         arriving query vectors served per micro-batch
                         with per-batch pruned reads (ann_serve_stream)
  6. online indexing   — round 15: arriving DOCUMENTS streamed into
                         the persisted BM25 index's delta tier
                         (bm25_index_stream); the next search serves
                         them with exact idf/avgdl, no rebuild
  7. compaction        — round 15: the delta tier folded back into
                         the base layout (bm25_compact_index);
                         serving is bit-equal before and after;
                         round 16: committed via versioned dirs + ONE
                         atomic CURRENT-manifest pointer write
  8. online vector     — round 16: arriving EMBEDDINGS streamed into
     ingest               the persisted IVF index's batch-keyed delta
                         tier (ivf_index_stream) — assigned against
                         the frozen quantizer, ledger-gated, served
                         immediately off base ∪ live delta, folded
                         back by ivf_compact_index

Run: ``python examples/retrieval_serving.py [sf_dir]``
(default /root/testdata/sf0.001). Prints per-stage results.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_cep_examples_spark.queries import QUERIES, load_all  # noqa: E402
from flink_cep_examples_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    load_all()
    spark = get_spark(
        app_name="retrieval-serving", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")

    print("== 1+2. batched multi-query serving off the persisted index ==")
    served = QUERIES["ann_serve_many_persisted_topk"](spark, sf_dir)
    rows = served.collect()
    by_q: dict[int, int] = {}
    for r in rows:
        by_q[r.qid] = by_q.get(r.qid, 0) + 1
    print(f"   {len(rows)} result rows across queries {sorted(by_q)}")
    for r in rows[:3]:
        print(f"   qid={r.qid} -> vec {r.vec_id} (cos={r.cos:.4f})")

    print("== 3. MMR-diversified top-k, no training at serve time ==")
    for r in QUERIES["ann_mmr_ivf_persisted_topk"](spark, sf_dir).collect():
        print(f"   pick {r.rank}: vec {r.vec_id}" if hasattr(r, "rank")
              else f"   {tuple(r)}")

    print("== 4. hybrid BM25 + cosine RRF fusion ==")
    for r in QUERIES["docs_hybrid_rrf_topk"](spark, sf_dir).collect():
        print(
            f"   doc {r.doc_id}: r_lex={r.r_lex} r_sem={r.r_sem} "
            f"rrf={r.rrf:.5f}"
        )

    print("== 5. online serving: stream of query vectors, foreachBatch ==")
    import hashlib

    from flink_cep_examples_spark.streaming import ann_serve_stream

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    index_dir = f"{tempfile.gettempdir()}/spark_graft_ivf_index_{tag}"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qdf = emb.filter(emb.vec_id.isin([0, 7, 21])).selectExpr(
        "vec_id AS qid", "CAST(embedding AS array<double>) AS qv"
    )
    with tempfile.TemporaryDirectory() as tmp:
        qdf.coalesce(1).write.parquet(f"{tmp}/queries")
        schema = spark.read.parquet(f"{tmp}/queries").schema
        stream = spark.readStream.schema(schema).parquet(f"{tmp}/queries")
        q = (
            ann_serve_stream(spark, index_dir, stream, f"{tmp}/out")
            .option("checkpointLocation", f"{tmp}/chk")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(120):
            raise SystemExit("online-serving stream timed out")
        out = spark.read.parquet(f"{tmp}/out")
        print(f"   streamed results: {out.count()} rows "
              f"(batch ids: {sorted({r.batch for r in out.collect()})})")

    print("== 6. online indexing: stream new docs into the BM25 index ==")
    from pyspark.sql import functions as F

    from flink_cep_examples_spark.queries.text import (
        BM25_QUERY,
        bm25_search_persisted,
        ensure_bm25_index,
    )
    from flink_cep_examples_spark.streaming import bm25_index_stream

    # fresh index dir per run: the delta tier persists on disk, so a
    # shared path would carry a previous run's streamed doc into the
    # "pre-ingest" listing
    bm25_dir = tempfile.mkdtemp(prefix="spark_graft_bm25_ex_")
    ensure_bm25_index(spark, sf_dir, bm25_dir)
    before = {
        r.doc_id for r in bm25_search_persisted(
            spark, bm25_dir, BM25_QUERY
        ).collect()
    }
    # a synthetic arriving doc stuffed with the query terms — it must
    # take over the top slot once its postings land in the delta tier
    arriving = spark.createDataFrame(
        [(9_000_123, " ".join(BM25_QUERY * 4))], "doc_id long, text string"
    )
    with tempfile.TemporaryDirectory() as tmp:
        arriving.coalesce(1).write.parquet(f"{tmp}/docs")
        schema = spark.read.parquet(f"{tmp}/docs").schema
        stream = spark.readStream.schema(schema).parquet(f"{tmp}/docs")
        q = (
            # max_delta_batches arms the round-16 auto-compaction
            # policy: the ingest tail bounds the delta tier itself (a
            # single small batch stays below the threshold here, so
            # stage 7 shows the manual path too)
            bm25_index_stream(spark, bm25_dir, stream, max_delta_batches=8)
            .option("checkpointLocation", f"{tmp}/chk")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(120):
            raise SystemExit("online-indexing stream timed out")
    after = bm25_search_persisted(spark, bm25_dir, BM25_QUERY).collect()
    top = after[0]
    print(f"   pre-ingest top-k docs: {sorted(before)}")
    print(f"   post-ingest top hit: doc {top.doc_id} "
          f"(score {top.score:.3f}) — the streamed doc"
          if top.doc_id == 9_000_123
          else f"   post-ingest top hit: doc {top.doc_id}")

    print("== 7. compact the delta tier back into the base layout ==")
    from flink_cep_examples_spark.index_manifest import read_manifest
    from flink_cep_examples_spark.queries.text import bm25_compact_index

    v_before = read_manifest(bm25_dir)["version"]
    bm25_compact_index(spark, bm25_dir)
    man = read_manifest(bm25_dir)
    compacted = bm25_search_persisted(spark, bm25_dir, BM25_QUERY).collect()
    same = {(r.doc_id, r.score) for r in compacted} == {
        (r.doc_id, r.score) for r in after
    }
    print(f"   post-compaction serving bit-equal: {same} "
          f"(manifest v{v_before} -> v{man['version']} via one atomic "
          f"pointer write; absorbed batches {man['absorbed']})")
    import shutil

    shutil.rmtree(bm25_dir)  # per-run index dir — don't leak /tmp

    print("== 8. online vector ingest: stream embeddings into the IVF "
          "index ==")
    from flink_cep_examples_spark.index_manifest import (
        read_manifest as _read_man,
        resolve_tier,
    )
    from flink_cep_examples_spark.queries.ivf import (
        ivf_compact_index,
        ivf_search_persisted,
        write_ivf_index,
    )
    from flink_cep_examples_spark.streaming import ivf_index_stream

    ivf_dir = tempfile.mkdtemp(prefix="spark_graft_ivf_ex_")
    write_ivf_index(spark, sf_dir, ivf_dir)
    src0 = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter("vec_id = 0")
        .first()
    )
    qvec = [float(x) for x in src0.embedding]
    # a synthetic arriving vector: a near-twin of the query vector —
    # it must appear in the served top-k the moment its batch lands
    arriving_vecs = spark.createDataFrame(
        [(9_000_777, src0.label, [v + 1e-4 for v in qvec])],
        "vec_id long, label int, embedding array<float>",
    )
    with tempfile.TemporaryDirectory() as tmp:
        arriving_vecs.coalesce(1).write.parquet(f"{tmp}/vecs")
        schema = spark.read.parquet(f"{tmp}/vecs").schema
        stream = spark.readStream.schema(schema).parquet(f"{tmp}/vecs")
        q = (
            ivf_index_stream(spark, ivf_dir, stream, max_delta_batches=8)
            .option("checkpointLocation", f"{tmp}/chk")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(120):
            raise SystemExit("vector-ingest stream timed out")
    hits = ivf_search_persisted(spark, ivf_dir, qvec, top_k=3).collect()
    ids = [r.vec_id for r in hits]
    print(f"   post-ingest top-3: {ids} "
          f"{'— the streamed twin serves' if 9_000_777 in ids else ''}")
    v_before = _read_man(ivf_dir)["version"]
    ivf_compact_index(spark, ivf_dir)
    man = _read_man(ivf_dir)
    hits2 = ivf_search_persisted(spark, ivf_dir, qvec, top_k=3).collect()
    same = [(r.vec_id, r.cos) for r in hits2] == [
        (r.vec_id, r.cos) for r in hits
    ]
    n_lists_rows = spark.read.parquet(resolve_tier(ivf_dir, "lists")).count()
    print(f"   compacted v{v_before} -> v{man['version']} "
          f"(absorbed {man['absorbed']}); serving bit-equal: {same}; "
          f"{n_lists_rows} vectors in the base lists")
    shutil.rmtree(ivf_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
