"""Ingest-time NB quality scoring: the frozen-model serve path must
reproduce the train+score catalog query bit-for-bit on the training
corpus (shared featurization + exact integer fold), stream or batch."""

from __future__ import annotations

from flink_cep_examples_spark.queries import QUERIES, load_all
from flink_cep_examples_spark.streaming.quality_stream import (
    nb_quality_score,
    train_nb_quality_model,
)

load_all()


def test_nb_serve_stream_matches_batch_bitwise(spark, sf_small, tmp_path):
    batch = {
        r.doc_id: (r.n_feats, r.log_odds, r.pred_good)
        for r in QUERIES["docs_nb_quality_classifier"](
            spark, sf_small
        ).collect()
    }
    model = train_nb_quality_model(spark, sf_small)
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    src = tmp_path / "src"
    docs.repartition(3).write.parquet(str(src))
    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    q = (
        nb_quality_score(stream, model)
        .writeStream.format("memory")
        .queryName("nb_serve")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM nb_serve").collect()
    got = {r.doc_id: (r.n_feats, r.log_odds, r.pred_good) for r in rows}
    assert got == batch  # bit-exact: integer nano-nat fold both sides
    assert len(rows) == len(got)  # stateless: one row per doc, no dups


def test_nb_serve_scores_unseen_docs(spark, sf_small):
    """New documents (tokens hashing to buckets absent from training
    get the add-one default weight) score without error, and a doc
    made of corpus-frequent good text still classifies good."""
    model = train_nb_quality_model(spark, sf_small)
    good_text = " ".join(["spark table query join filter row data"] * 10)
    rows = [
        (900001, good_text, "en", "s", len(good_text)),
        (900002, "zzqx9 vvkp7 qqjm3", "en", "s", 17),  # unseen-ish junk
        (900003, "", "en", "s", 0),  # empty doc: the [''] token
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.doc_id: r for r in nb_quality_score(df, model).collect()}
    assert set(out) == {900001, 900002, 900003}
    assert out[900001].pred_good  # frequent good-register text
    for r in out.values():
        assert r.n_feats >= 2  # >=1 token bucket + the length bin


def test_pii_scrub_serves_streams_natively(spark, tmp_path):
    """scrub_pii is pure column expressions — it runs UNCHANGED on a
    streaming DataFrame (no twin needed); the streamed redactions
    equal the batch ones exactly. Pins the ingest story's 5th stage."""
    from flink_cep_examples_spark.queries.curation import scrub_pii

    rows = [
        (1, "mail me at a.user@example.com or 10.0.0.1 thanks"),
        (2, "call +1 (555) 123-4567 now"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    batch = {
        r.doc_id: (r.text_scrubbed, r.n_emails, r.n_ips, r.n_phones)
        for r in scrub_pii(df).collect()
    }
    src = tmp_path / "src"
    df.coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        scrub_pii(stream)
        .writeStream.format("memory")
        .queryName("pii_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        r.doc_id: (r.text_scrubbed, r.n_emails, r.n_ips, r.n_phones)
        for r in spark.sql("SELECT * FROM pii_stream").collect()
    }
    assert got == batch
    assert got[1][1] == 1 and got[1][2] == 1 and got[2][3] == 1
