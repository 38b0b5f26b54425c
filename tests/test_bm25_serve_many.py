"""Batched BM25 serving (round 16): N queries answered off ONE pruned
scan of the persisted inverted index — agreement with the single-query
tier on the shared query, per-query candidate semantics, and delta-
tier awareness."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_cep_examples_spark.queries.text import (
    BM25_MANY_QUERIES,
    BM25_QUERY,
    bm25_append_docs,
    bm25_search_persisted,
    bm25_search_persisted_many,
    write_bm25_index,
)


def _index(spark, sf_small, tmp_path):
    idx = str(tmp_path / "idx")
    write_bm25_index(spark, sf_small, idx)
    return idx


def test_many_agrees_with_single_on_shared_query(
    spark, sf_small, tmp_path
):
    """qid 0 IS the single-query tier's pinned query: scores must be
    bit-equal doubles and the ranked doc set identical."""
    idx = _index(spark, sf_small, tmp_path)
    single = {
        r.doc_id: r.score
        for r in bm25_search_persisted(spark, idx, BM25_QUERY).collect()
    }
    many = {
        r.doc_id: r.score
        for r in bm25_search_persisted_many(
            spark, idx, BM25_MANY_QUERIES
        )
        .filter("qid = 0")
        .collect()
    }
    assert many == single


def test_many_candidate_semantics_and_pruning(spark, sf_small, tmp_path):
    """Every result row's doc contains ≥1 of its query's terms; every
    query returns rows; the single scan partition-prunes to the union
    terms' buckets."""
    idx = _index(spark, sf_small, tmp_path)
    out = bm25_search_persisted_many(spark, idx, BM25_MANY_QUERIES)
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan_lines = [
        l for l in plan.splitlines() if "PartitionFilters" in l
    ]
    assert any("term_bucket" in l for l in scan_lines), scan_lines
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    assert set(by_q) == set(BM25_MANY_QUERIES)
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(
            f"{sf_small}/documents.parquet"
        ).collect()
    }
    for qid, qrows in by_q.items():
        terms = set(BM25_MANY_QUERIES[qid])
        assert len(qrows) > 0
        for r in qrows:
            toks = set(docs[r.doc_id].split())
            assert toks & terms, (qid, r.doc_id)


def test_hybrid_many_agrees_with_single_on_shared_pairing(
    spark, sf_small
):
    """Hybrid qid 0 pairs the single-query hybrid's exact arms
    (BM25_QUERY + query vector 0): its fused rows must match
    hybrid_rrf_persisted_topk bit-for-bit (ranks and rrf doubles)."""
    from flink_cep_examples_spark.queries import QUERIES, load_all

    load_all()
    single = [
        (r.doc_id, r.r_lex, r.r_sem, r.rrf)
        for r in QUERIES["hybrid_rrf_persisted_topk"](
            spark, sf_small
        ).collect()
    ]
    many = [
        (r.doc_id, r.r_lex, r.r_sem, r.rrf)
        for r in sorted(
            QUERIES["hybrid_rrf_serve_many_topk"](spark, sf_small)
            .filter("qid = 0")
            .collect(),
            key=lambda r: (-r.rrf, r.doc_id),
        )
    ]
    assert many == single


def test_many_serves_delta_tier(spark, sf_small, tmp_path):
    """An appended doc stuffed with one query's terms must surface in
    exactly that query's batched results — the many path reads the
    same ledger-gated delta union as the single path."""
    idx = _index(spark, sf_small, tmp_path)
    new_id = 9_600_000
    bm25_append_docs(
        spark,
        idx,
        spark.createDataFrame(
            [(new_id, " ".join(BM25_MANY_QUERIES[2] * 5))],
            "doc_id long, text string",
        ),
    )
    rows = bm25_search_persisted_many(
        spark, idx, BM25_MANY_QUERIES
    ).collect()
    q2 = sorted(
        (r for r in rows if r.qid == 2),
        key=lambda r: (-r.score, r.doc_id),
    )
    assert q2[0].doc_id == new_id  # tops its own query
    assert all(
        r.doc_id != new_id for r in rows if r.qid == 0
    )  # absent from an unrelated query's candidates
