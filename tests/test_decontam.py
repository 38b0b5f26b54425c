"""Decontamination semantics on constructed rows: an 8-token shared
run is a hit, a 7-token one is not, and normalization (case /
punctuation) does not defeat the match. The exact-hash oracle runs in
test_oracle_extensions."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_cep_examples_spark.queries import load_all
from flink_cep_examples_spark.queries.decontam import N_GRAM, _window_hashes

load_all()

EVAL_TEXT = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens


def _hashes(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return _window_hashes(df)


def _hits(spark, corpus_text):
    ev = _hashes(spark, [(1, EVAL_TEXT)]).select("wh").distinct()
    cw = _hashes(spark, [(2, corpus_text)])
    return cw.join(ev, "wh").count()


def test_exact_8gram_is_flagged(spark):
    assert _hits(spark, f"intro words {EVAL_TEXT} trailing words") == 1


def test_7_token_overlap_is_not_flagged(spark):
    seven = " ".join(EVAL_TEXT.split()[:7])
    assert _hits(spark, f"intro {seven} unrelated tail of doc") == 0


def test_normalization_defeats_case_and_punct(spark):
    disguised = "Alpha, BETA gamma; delta EPSILON zeta (eta) theta!"
    assert _hits(spark, f"some prefix {disguised} some suffix") == 1


def test_short_docs_produce_no_windows(spark):
    out = _hashes(spark, [(1, "only five little tokens here")])
    assert out.count() == 0


def test_window_count_is_tokens_minus_seven(spark):
    n = 12
    text = " ".join(f"t{i}" for i in range(n))
    assert _hashes(spark, [(1, text)]).count() == n - (N_GRAM - 1)


def test_bloom_flags_superset_of_exact(spark, sf_small):
    """Bloom guarantee: no false negatives — every exactly-
    contaminated doc is bloom-flagged with at least as many window
    hits (false positives allowed, extra docs/hits possible)."""
    from flink_cep_examples_spark.queries import QUERIES

    exact = {
        r.doc_id: r.n_hits
        for r in QUERIES["docs_decontaminate"](spark, sf_small).collect()
    }
    bloom = {
        r.doc_id: r.n_hits_bloom
        for r in QUERIES["docs_decontaminate_bloom"](
            spark, sf_small
        ).collect()
    }
    assert set(exact) <= set(bloom)
    for doc, n in exact.items():
        assert bloom[doc] >= n, (doc, bloom[doc], n)


def test_decontam_report_cells_reconcile(spark, sf_small):
    """docs_decontam_report (round 15): the report semantics the
    oracle hash can't show. Per (source, lang) cell: n_docs sums to
    the arriving (non-eval) corpus, n_contam and total_hits reconcile
    exactly against the flag set, contam_rate = n_contam / n_docs,
    and a contaminated doc is counted in exactly one cell."""
    from flink_cep_examples_spark.queries import QUERIES, load_all
    from flink_cep_examples_spark.queries.decontam import (
        _MIX,
        _MOD,
        EVAL_MOD,
        EVAL_RESIDUE,
    )

    load_all()
    cells = QUERIES["docs_decontam_report"](spark, sf_small).collect()
    flags = {
        r.doc_id: r.n_hits
        for r in QUERIES["docs_decontaminate"](spark, sf_small).collect()
    }
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").collect()
    arriving = [
        d
        for d in docs
        if (d.doc_id * _MIX) % _MOD % EVAL_MOD != EVAL_RESIDUE
    ]
    assert sum(c.n_docs for c in cells) == len(arriving)
    assert sum(c.n_contam for c in cells) == len(flags)
    assert sum(c.total_hits for c in cells) == sum(flags.values())
    by_cell_flags = {}
    by_cell_hits = {}
    for d in arriving:
        if d.doc_id in flags:
            key = (d.source, d.lang)
            by_cell_flags[key] = by_cell_flags.get(key, 0) + 1
            by_cell_hits[key] = by_cell_hits.get(key, 0) + flags[d.doc_id]
    for c in cells:
        key = (c.source, c.lang)
        assert c.n_contam == by_cell_flags.get(key, 0), key
        assert c.total_hits == by_cell_hits.get(key, 0), key
        assert c.contam_rate == c.n_contam / c.n_docs, key
