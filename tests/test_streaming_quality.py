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


def test_nb_heldout_generalization(spark, sf_small, tmp_path):
    """The deployment shape (VERDICT r13 item 3): train on a
    deterministic HALF of the corpus, score the other half — data the
    trainer never saw — batch AND streamed. Pins (a) held-out label
    agreement (the model generalizes past its training rows, not just
    memorizes them), (b) both classes predicted on the held-out side,
    (c) streamed == batch bit-equality on the held-out replay."""
    from pyspark.sql import functions as F

    from flink_cep_examples_spark.queries.curation import _nb_weak_labels

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    held = docs.filter(F.col("doc_id") % 2 == 1)
    model = train_nb_quality_model(spark, sf_small, docs=train)

    batch = {
        r.doc_id: (r.n_feats, r.log_odds, r.pred_good)
        for r in nb_quality_score(held, model).collect()
    }
    n_held = held.count()
    assert len(batch) == n_held > 0

    src = tmp_path / "held"
    held.repartition(3).write.parquet(str(src))
    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    q = (
        nb_quality_score(stream, model)
        .writeStream.format("memory")
        .queryName("nb_heldout")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r.doc_id: (r.n_feats, r.log_odds, r.pred_good)
        for r in spark.sql("SELECT * FROM nb_heldout").collect()
    }
    assert streamed == batch  # bit-exact integer fold, unseen data

    labels = {
        r.doc_id: r.rule_good
        for r in _nb_weak_labels(held).select("doc_id", "rule_good").collect()
    }
    agree = sum(batch[d][2] == labels[d] for d in batch) / len(batch)
    majority = max(
        sum(labels.values()), len(labels) - sum(labels.values())
    ) / len(labels)
    # generalization, not memorization: well above chance AND above the
    # degenerate always-majority model (measured 0.82 vs 0.54 at
    # sf0.001; the train-corpus pin is 0.90 — held-out is allowed the
    # half-data smoothing shift but must keep real discrimination)
    assert agree >= 0.75, f"held-out agreement {agree:.3f} < 0.75"
    assert agree > majority + 0.1, (agree, majority)
    preds = {batch[d][2] for d in batch}
    assert preds == {True, False}  # both classes on the held-out side
    good = [batch[d][1] for d in batch if labels[d]]
    bad = [batch[d][1] for d in batch if not labels[d]]
    # ranking survives the split: rule-good docs score above rule-bad
    assert sum(good) / len(good) > 0 > sum(bad) / len(bad)


def test_nb_unseen_bucket_takes_default_path(spark, sf_small):
    """A served document whose tokens hash to buckets the trainer
    never saw must score through the add-one default weight — the
    exact fold lpq + Σ tf·default (+ the length-bin weight), not a
    KeyError, a zero, or a silent drop. Trains on a 5-doc slice so
    unseen buckets exist by construction, then crafts a doc from a
    token proven to land in one."""
    from flink_cep_examples_spark.streaming.quality_stream import _bucket
    from flink_cep_examples_spark.queries.curation import NBQ_BUCKETS

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    train = docs.orderBy("doc_id").limit(5)
    model = train_nb_quality_model(spark, sf_small, docs=train)

    seen_tok_buckets = {b for b in model.weights if b < NBQ_BUCKETS}
    unseen = set(range(NBQ_BUCKETS)) - seen_tok_buckets
    assert unseen, "5-doc training slice unexpectedly covered all buckets"
    tok = next(
        f"w{i}" for i in range(100_000) if _bucket(f"w{i}") in unseen
    )

    text = " ".join([tok] * 3)  # 3 tokens -> length bin 512 (bin 0)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = nb_quality_score(df, model).collect()[0]
    len_bin = NBQ_BUCKETS  # 3 // 16 = 0
    expected_sq = (
        model.lpq
        + 3 * model.default_lwq
        + model.weights.get(len_bin, model.default_lwq)
    )
    assert row.n_feats == 4
    assert row.log_odds == expected_sq / 1e9
    assert row.pred_good == (expected_sq > 0)


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
