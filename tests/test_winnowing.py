"""Winnowing fingerprints (queries/dedup.py::docs_winnowing): the
Schleimer/Wilkerson/Aiken guarantee — two documents sharing a token
run of at least W + SHINGLE_N - 1 = 6 tokens MUST share a fingerprint
hash — plus the density bound (selections <= full windows)."""

from __future__ import annotations

import pytest

from flink_cep_examples_spark.queries.dedup import (
    WINNOW_W,
    docs_winnowing,
)


@pytest.fixture(scope="module")
def winnow_docs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("winnow")
    shared = "the quick brown fox jumps over the lazy dog today"  # 10 tokens
    rows = [
        (0, f"alpha beta gamma {shared} delta epsilon", "en", "src0", 0),
        (1, f"one two three four five {shared} six seven", "en", "src1", 0),
        (2, "completely different text with no overlap at all here", "en", "src2", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(str(base / "documents.parquet"))
    return str(base)


def test_shared_run_shares_a_fingerprint(spark, winnow_docs):
    fps = docs_winnowing(spark, winnow_docs).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp_hash)
    # guarantee: the 10-token shared run (> W + 2) forces a common hash
    assert by_doc[0] & by_doc[1], (by_doc[0], by_doc[1])
    # the unrelated doc shares nothing with either
    assert not (by_doc[2] & (by_doc[0] | by_doc[1]))


def test_density_bound(spark, winnow_docs):
    from flink_cep_examples_spark.queries.dedup import _tokens
    from pyspark.sql import functions as F

    docs = spark.read.parquet(winnow_docs + "/documents.parquet")
    n_tok = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(_tokens(F.col("text"))).alias("n")
        ).collect()
    }
    fps = docs_winnowing(spark, winnow_docs).collect()
    counts = {}
    for r in fps:
        counts[r.doc_id] = counts.get(r.doc_id, 0) + 1
    for d, c in counts.items():
        n_windows = n_tok[d] - 2 - (WINNOW_W - 1)  # shingles - (W-1)
        assert 1 <= c <= n_windows
