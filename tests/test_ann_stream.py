"""Online ANN serving (round 14): a stream of query vectors served off
the frozen persisted IVF index must be bit-equal to batch serving —
same kernel, per-batch partition-pruned reads — and a replayed batch
must not duplicate results (idempotent batch-partition overwrite)."""

from __future__ import annotations

import hashlib
import tempfile

from flink_cep_examples_spark.queries import QUERIES, load_all
from flink_cep_examples_spark.streaming import ann_serve_stream

load_all()


def _index_dir(spark, sf_small) -> str:
    # materialize the shared session index (train-once guard)
    QUERIES["ivf_persisted_topk"](spark, sf_small).collect()
    tag = hashlib.md5(sf_small.encode()).hexdigest()[:10]
    return f"{tempfile.gettempdir()}/spark_graft_ivf_index_{tag}"


def test_ann_stream_matches_batch_serving(spark, sf_small, tmp_path):
    from flink_cep_examples_spark.queries.ivf import (
        ivf_search_persisted_many,
    )

    index_dir = _index_dir(spark, sf_small)
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    qids = [0, 7, 21, 33, 48]
    qdf = emb.filter(emb.vec_id.isin(qids)).selectExpr(
        "vec_id AS qid", "CAST(embedding AS array<double>) AS qv"
    )
    src = tmp_path / "queries"
    # two files -> two micro-batches with maxFilesPerTrigger=1
    qdf.filter("qid <= 7").coalesce(1).write.parquet(str(src / "p1"))
    qdf.filter("qid > 7").coalesce(1).write.parquet(str(src / "p2"))
    schema = spark.read.parquet(str(src / "p1")).schema

    sink = str(tmp_path / "out")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        ann_serve_stream(spark, index_dir, stream, sink)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = sorted(
        (r.qid, r.vec_id, r.label, r.cid, r.cos)
        for r in spark.read.parquet(sink).collect()
    )
    queries = {
        int(r.qid): [float(x) for x in r.qv] for r in qdf.collect()
    }
    want = sorted(
        (r.qid, r.vec_id, r.label, r.cid, r.cos)
        for r in ivf_search_persisted_many(
            spark, index_dir, queries
        ).collect()
    )
    assert got == want and got  # bit-equal: shared kernel both tiers
    n_batches = {r.batch for r in spark.read.parquet(sink).collect()}
    assert len(n_batches) == 2  # really served across micro-batches


def test_ann_stream_replay_is_idempotent(spark, sf_small, tmp_path):
    """foreachBatch replays a batch after failure; the batch-partition
    overwrite must leave the sink duplicate-free. Simulated by running
    the same availableNow stream TWICE against a fresh checkpoint —
    the second run re-serves every batch id over the same sink."""
    index_dir = _index_dir(spark, sf_small)
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    qdf = emb.filter(emb.vec_id.isin([0, 7])).selectExpr(
        "vec_id AS qid", "CAST(embedding AS array<double>) AS qv"
    )
    src = tmp_path / "queries"
    qdf.coalesce(1).write.parquet(str(src))
    schema = spark.read.parquet(str(src)).schema
    sink = str(tmp_path / "out")

    def run(chk: str) -> None:
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            ann_serve_stream(spark, index_dir, stream, sink)
            .option("checkpointLocation", str(tmp_path / chk))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("chk1")
    first = sorted(map(tuple, spark.read.parquet(sink).collect()))
    run("chk2")  # full replay of batch 0 over the same sink
    second = sorted(map(tuple, spark.read.parquet(sink).collect()))
    assert second == first  # no duplicates, no drift


def test_semantic_decontam_serves_streams_natively(
    spark, sf_small, tmp_path
):
    """semantic_decontaminate_frame is ONE stateless mapInPandas with
    the frozen eval matrix in the closure — like scrub_pii it runs
    UNCHANGED on a streaming DataFrame (no twin module needed): the
    PRODUCT scorer applied to a stream of the arriving (non-eval)
    corpus slice equals the batch catalog query row-for-row."""
    from pyspark.sql import functions as F

    from flink_cep_examples_spark.queries import QUERIES, load_all
    from flink_cep_examples_spark.queries.similarity import (
        SEM_EVAL_MOD,
        SEM_EVAL_RESIDUE,
        sem_eval_matrix,
        semantic_decontaminate_frame,
    )

    load_all()
    batch = {
        (r.vec_id, r.n_hits, r.max_cos)
        for r in QUERIES["docs_semantic_decontaminate"](
            spark, sf_small
        ).collect()
    }
    assert batch  # non-trivial at sf0.001 (30 contaminated rows)

    E = sem_eval_matrix(spark, sf_small)  # frozen once, pre-ingest
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    src = tmp_path / "src"
    emb.repartition(2).write.parquet(str(src))
    stream = spark.readStream.schema(emb.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    corp_stream = stream.filter(
        (F.col("vec_id") % SEM_EVAL_MOD) != SEM_EVAL_RESIDUE
    )
    out = semantic_decontaminate_frame(corp_stream, E)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("sem_decontam_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.vec_id, r.n_hits, r.max_cos)
        for r in spark.sql("SELECT * FROM sem_decontam_stream").collect()
    }
    assert got == batch
