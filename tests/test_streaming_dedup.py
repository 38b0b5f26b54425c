"""Stream/batch agreement for streaming dedup: a source containing
every event twice (full-row duplicates) must come out exactly once
under ``dedup_exact_stream`` / ``dedup_content_stream``, matching the
batch ``dropDuplicates`` answer. Full-row duplicates make the
first-occurrence choice immaterial, so set equality is exact."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_cep_examples_spark.sources.tables import load_table
from flink_cep_examples_spark.streaming.dedup_stream import (
    dedup_content_stream,
    dedup_exact_stream,
)


@pytest.fixture(scope="module")
def doubled_events_dir(spark, sf_small, tmp_path_factory):
    """sf0.001 events written twice into one parquet dir — every row is
    an exact duplicate pair."""
    out = str(tmp_path_factory.mktemp("dedup_stream") / "events")
    ev = load_table(spark, sf_small, "events").coalesce(2)
    ev.write.parquet(out)
    ev.write.mode("append").parquet(out)
    return out


def _run_stream(spark, src_dir, build, name):
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = (
        build(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


@pytest.mark.slow
def test_exact_dedup_stream_matches_batch(spark, doubled_events_dir):
    src = spark.read.parquet(doubled_events_dir)
    assert src.count() == 2 * src.select("event_id").distinct().count()

    out = _run_stream(
        spark,
        doubled_events_dir,
        lambda s: dedup_exact_stream(s, ["event_id"]),
        "dedup_exact_mem",
    )
    batch = src.dropDuplicates(["event_id"])
    assert out.count() == batch.count()
    assert sorted(r.event_id for r in out.select("event_id").collect()) == sorted(
        r.event_id for r in batch.select("event_id").collect()
    )


@pytest.mark.slow
def test_content_dedup_stream_keys_on_digest(spark, doubled_events_dir):
    """Content keying: dedup on md5(props) — distinct prop payloads
    survive exactly once each."""
    src = spark.read.parquet(doubled_events_dir)
    n_payloads = src.select("props").distinct().count()

    out = _run_stream(
        spark,
        doubled_events_dir,
        lambda s: dedup_content_stream(s, content_col="props"),
        "dedup_content_mem",
    )
    assert out.count() == n_payloads
    assert out.select("content_key").distinct().count() == n_payloads


@pytest.fixture(scope="module")
def docs_with_ts_dir(spark, sf_small, tmp_path_factory):
    """sf0.001 documents + a synthetic event time that makes arrival
    order = doc_id order (so the batch candidate-pair convention
    'smaller doc_id is the owner' is exactly the stream's
    first-arrival ownership)."""
    out = str(tmp_path_factory.mktemp("minhash_stream") / "docs")
    (
        load_table(spark, sf_small, "documents")
        .withColumn(
            "ts",
            F.to_timestamp(F.lit("2020-05-01 00:00:00"))
            + F.make_dt_interval(secs=F.col("doc_id").cast("double")),
        )
        .coalesce(2)
        .write.parquet(out)
    )
    return out


@pytest.mark.slow
def test_minhash_band_keys_udf_matches_batch(spark, sf_small):
    """The streaming scan-side band-key kernel must reproduce the batch
    signature pipeline's band keys bit-for-bit, doc by doc."""
    from flink_cep_examples_spark.queries.dedup import (
        BANDS,
        NUM_HASHES,
        ROWS_PER_BAND,
        _minhash_signatures,
    )
    from flink_cep_examples_spark.streaming.dedup_stream import (
        minhash_band_keys_udf,
    )

    docs = load_table(spark, sf_small, "documents")
    sig = _minhash_signatures(docs)
    mh = [F.col(f"mh{i}") for i in range(NUM_HASHES)]
    batch_keys = {
        r.doc_id: r.keys
        for r in sig.select(
            "doc_id",
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            ",",
                            F.lit(bi),
                            *mh[bi * ROWS_PER_BAND : (bi + 1) * ROWS_PER_BAND],
                        )
                    )
                    for bi in range(BANDS)
                ]
            ).alias("keys"),
        ).collect()
    }
    stream_keys = {
        r.doc_id: r.keys
        for r in docs.select(
            "doc_id", minhash_band_keys_udf()(F.col("text")).alias("keys")
        ).collect()
    }
    assert stream_keys == batch_keys and stream_keys


@pytest.mark.slow
def test_minhash_band_stream_matches_batch_losers(spark, docs_with_ts_dir, sf_small):
    """Stream/batch agreement for near-dup detection: the docs flagged
    by the streaming detector (>= 1 band-bucket collision with an
    earlier arrival) must be exactly the batch candidate pairs' doc_b
    side (dedup_minhash_lsh joins on shared bucket with
    doc_a < doc_b), and every detected (owner, dup) must be a batch
    candidate pair."""
    from flink_cep_examples_spark.queries.dedup import dedup_minhash_lsh
    from flink_cep_examples_spark.streaming.dedup_stream import (
        dedup_minhash_band_stream,
    )

    out = _run_stream(
        spark,
        docs_with_ts_dir,
        lambda s: dedup_minhash_band_stream(
            s, watermark_delay="365 days", signature="md5"
        ),
        "minhash_band_mem",
    )
    detections = out.collect()
    pairs = dedup_minhash_lsh(spark, sf_small).collect()
    batch_losers = {r.doc_b for r in pairs}
    batch_pairs = {(r.doc_a, r.doc_b) for r in pairs}

    assert {r.dup_id for r in detections} == batch_losers and batch_losers
    # every detection is a genuine batch candidate pair (owner is the
    # bucket's first arrival = smallest doc_id in the bucket, which is
    # a valid doc_a for that doc_b)
    assert {(r.owner_id, r.dup_id) for r in detections} <= batch_pairs


@pytest.mark.slow
def test_vector_band_stream_matches_batch(spark, docs_with_ts_dir):
    """The "vector" signature mode (round 5, the deployment default):
    scan-side band keys come from codegen tokenization + one Arrow
    numpy kernel shared bit-identically by batch and streaming — the
    streamed detections must equal the batch first-owner convention
    computed from the SAME with_vector_band_keys column."""
    from pyspark.sql import Window

    from flink_cep_examples_spark.queries.dedup import with_vector_band_keys
    from flink_cep_examples_spark.streaming.dedup_stream import (
        dedup_minhash_band_stream,
    )

    out = _run_stream(
        spark,
        docs_with_ts_dir,
        lambda s: dedup_minhash_band_stream(s, watermark_delay="365 days"),
        "vector_band_mem",
    )
    detections = {(r.band_key, r.dup_id, r.owner_id) for r in out.collect()}

    docs = spark.read.parquet(docs_with_ts_dir)
    exploded = with_vector_band_keys(docs).select(
        "doc_id",
        "ts",
        F.explode(F.col("band_keys").cast("array<string>")).alias("band_key"),
    )
    w = Window.partitionBy("band_key").orderBy("ts", "doc_id")
    batch = (
        exploded.withColumn("owner_id", F.first("doc_id").over(w))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
    )
    expected = {
        (r.band_key, r.doc_id, r.owner_id) for r in batch.collect()
    }
    assert detections == expected and detections


@pytest.mark.slow
def test_vector_band_keys_flag_planted_near_dups(spark):
    """Recall smoke for the vector mode: 30 planted near-identical pairs
    (one token edited out of ~60) must share >= 1 band bucket;
    unrelated random docs must not collide with them."""
    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    for i in range(30):
        base = [rng.choice(vocab) for _ in range(60)]
        edited = list(base)
        edited[rng.randrange(60)] = rng.choice(vocab)
        rows.append((2 * i, " ".join(base)))
        rows.append((2 * i + 1, " ".join(edited)))
    for j in range(100, 130):  # unrelated docs
        rows.append((j + 1000, " ".join(rng.choice(vocab) for _ in range(60))))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    from flink_cep_examples_spark.queries.dedup import with_vector_band_keys

    keyed = with_vector_band_keys(df).select(
        "doc_id", F.explode("band_keys").alias("bk")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = {
        (r.x, r.y)
        for r in a.join(
            b,
            (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .distinct()
        .collect()
    }
    planted = {(2 * i, 2 * i + 1) for i in range(30)}
    recall = len(planted & pairs) / len(planted)
    assert recall >= 0.9, recall
    # no random doc collides with a planted one
    assert not any(x >= 1000 or y >= 1000 for x, y in pairs), pairs


@pytest.mark.slow
def test_corpus_clean_stream_matches_batch_prefix(spark, docs_with_ts_dir, sf_small):
    """Streaming ingest pipeline (round 5): quality gate + exact
    content dedup replayed over the corpus must keep exactly the batch
    pipeline's quality∧canonical set (arrival order = doc_id order in
    the fixture, so stream first-occurrence = batch min-doc_id
    canonical). Near-dup removal is the documented compaction-side
    stage — its flagged set is pinned by the band-stream agreement
    tests above."""
    from flink_cep_examples_spark.queries.dedup import dedup_exact
    from flink_cep_examples_spark.queries.text import text_quality_scores
    from flink_cep_examples_spark.streaming.dedup_stream import (
        corpus_clean_stream,
    )

    out = _run_stream(
        spark,
        docs_with_ts_dir,
        lambda s: corpus_clean_stream(s, watermark_delay="365 days"),
        "clean_stream_mem",
    )
    got = {r.doc_id for r in out.collect()}

    quality = {
        r.doc_id
        for r in text_quality_scores(spark, sf_small).where("keep").collect()
    }
    canonical = {
        r.doc_id
        for r in dedup_exact(spark, sf_small)
        .where(F.col("doc_id") == F.col("canonical_id"))
        .collect()
    }
    # content keying differs slightly from the batch exact-dedup's
    # normalized-text hash ONLY in normalization (batch normalizes,
    # stream hashes raw text) — the synthetic corpus' exact dups are
    # byte-identical, so the sets coincide
    assert got == (quality & canonical) and got


def test_novelty_check_stream_against_frozen_corpus(
    spark, sf_small, tmp_path
):
    """Round-13 novelty check: a perturbed copy of a corpus doc
    collides with the persisted band index (>=1 shared band — the LSH
    candidate rule), a fresh doc emits nothing, and the streamed rows
    equal the batch run of the same operator exactly (shared kernel +
    one stream-static join)."""
    from flink_cep_examples_spark.streaming.dedup_stream import (
        novelty_check_stream,
        write_band_index,
    )

    idx = str(tmp_path / "idx")
    write_band_index(spark, sf_small, idx)
    src_docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_small}/documents.parquet")
        .filter("doc_id IN (7, 11)")
        .collect()
    }
    near_a = src_docs[7].replace(src_docs[7].split()[-1], "changed", 1)
    near_b = src_docs[11] + " tail"
    arriving = spark.createDataFrame(
        [
            (800_001, near_a),
            (800_002, near_b),
            (800_003, "totally fresh zq9 vk8 doc xj7 pq6 words here now"),
            (800_004, "another novel mn5 bc4 document entirely df3 gh2"),
        ],
        "doc_id long, text string",
    )
    batch_rows = sorted(
        map(tuple, novelty_check_stream(arriving, idx).collect())
    )
    flagged = {r[0] for r in batch_rows}
    assert 800_001 in flagged and 800_002 in flagged
    assert 800_003 not in flagged and 800_004 not in flagged

    src = tmp_path / "src"
    arriving.coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(arriving.schema).parquet(str(src))
    q = (
        novelty_check_stream(stream, idx)
        .writeStream.format("memory")
        .queryName("novelty")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM novelty").collect())
    )
    assert got == batch_rows  # stream-static join: plan-identical
