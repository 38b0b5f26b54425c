"""Corpus-curation operators: dirty-text PII scrub behavior (the sf
corpus is clean, so the oracle differential only pins the identity
path), repetition edge cases, and plan-shape audits."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_cep_examples_spark.queries import QUERIES, load_all
from flink_cep_examples_spark.queries.curation import scrub_pii

load_all()


def _scrub_one(spark, text: str):
    df = spark.createDataFrame([(text,)], "text string")
    return scrub_pii(df).collect()[0]


def test_scrub_redacts_emails(spark):
    r = _scrub_one(spark, "mail a.user+tag@sub.example.org or b@c.io now")
    assert r.text_scrubbed == "mail <EMAIL> or <EMAIL> now"
    assert (r.n_emails, r.n_ips, r.n_phones) == (2, 0, 0)


def test_scrub_redacts_ipv4_and_phone(spark):
    r = _scrub_one(spark, "from 10.0.0.1 call +1 (555) 123-4567 ok")
    assert r.text_scrubbed == "from <IP> call <PHONE> ok"
    assert (r.n_emails, r.n_ips, r.n_phones) == (0, 1, 1)


def test_scrub_is_identity_on_clean_text(spark):
    clean = "just ordinary words with punctuation, no identifiers."
    r = _scrub_one(spark, clean)
    assert r.text_scrubbed == clean
    assert (r.n_emails, r.n_ips, r.n_phones) == (0, 0, 0)


def test_scrub_version_string_not_an_ip(spark):
    # dotted quads inside words (v1.2.3.4x) are excluded by \b anchors
    r = _scrub_one(spark, "release v1.2.3.4x shipped")
    assert r.n_ips == 0
    assert r.text_scrubbed == "release v1.2.3.4x shipped"


def test_repetition_handles_single_token_doc(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, "a a a a"), (3, "x y x y")],
        "doc_id long, text string",
    )

    from flink_cep_examples_spark.queries.curation import _bigrams, _toks

    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            F.size(_toks(F.col("text"))).alias("n"),
            F.size(_bigrams(_toks(F.col("text")))).alias("nb"),
            F.size(F.array_distinct(_bigrams(_toks(F.col("text"))))).alias(
                "nbd"
            ),
        ).collect()
    }
    assert (out[1].n, out[1].nb) == (1, 0)  # no descending-sequence blowup
    assert (out[2].nb, out[2].nbd) == (3, 1)  # "a a" x3
    assert (out[3].nb, out[3].nbd) == (3, 2)  # "x y","y x","x y"


def test_bigram_topk_is_take_ordered(spark, sf_small):
    """The corpus top-k must plan as TakeOrderedAndProject (bounded
    per-partition heaps), never a global Sort."""
    plan = (
        QUERIES["docs_bigram_topk"](spark, sf_small)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_gopher_flags_consistent(spark, sf_small):
    rows = QUERIES["docs_gopher_quality"](spark, sf_small).collect()
    for r in rows:
        assert r.keep == (r.words_ok and r.mean_len_ok and r.alpha_ok)


def test_chunk_spans_cover_and_overlap(spark):
    """Chunks tile the doc with the configured stride: consecutive
    starts differ by CHUNK_STRIDE, every char is covered, and the
    overlap region repeats verbatim."""
    from flink_cep_examples_spark.queries.curation import (
        CHUNK_CHARS,
        CHUNK_STRIDE,
    )

    text = "".join(chr(ord("a") + (i % 26)) for i in range(950))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        df.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.length("text") - 1, F.lit(0)),
                    F.lit(CHUNK_STRIDE),
                )
            ).alias("start"),
            "text",
        )
        .select(
            "start",
            F.expr(f"substr(text, start + 1, {CHUNK_CHARS})").alias("chunk"),
        )
        .collect(),
        key=lambda r: r.start,
    )
    starts = [r.start for r in rows]
    assert starts == [0, 400, 800]
    assert len(rows[0].chunk) == CHUNK_CHARS
    assert len(rows[-1].chunk) == 950 - 800
    # overlap region identical between consecutive chunks
    assert rows[0].chunk[CHUNK_STRIDE:] == rows[1].chunk[: CHUNK_CHARS - CHUNK_STRIDE]
    # full coverage: stitching strides reconstructs the doc
    assert "".join(r.chunk[:CHUNK_STRIDE] for r in rows) == text
