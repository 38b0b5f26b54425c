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


def test_logprob_buckets_tile_each_language(spark, sf_small):
    """Terciles the oracle also checks, plus the semantic property the
    oracle can't express alone: within each language the three bucket
    sizes differ by at most one, and head docs score >= tail docs."""
    out = QUERIES["docs_logprob_buckets"](spark, sf_small).collect()
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r.lang, {}).setdefault(r.bucket, 0)
        by_lang[r.lang][r.bucket] += 1
    for lang, counts in by_lang.items():
        sizes = [counts.get(b, 0) for b in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
    # rank ordering is consistent with the bucket labels
    scored = {
        r.doc_id: r.avg_logprob
        for r in QUERIES["docs_unigram_logprob"](spark, sf_small).collect()
    }
    for lang in by_lang:
        rows = [r for r in out if r.lang == lang]
        head_min = min(scored[r.doc_id] for r in rows if r.bucket == "head")
        tail_max = max(scored[r.doc_id] for r in rows if r.bucket == "tail")
        assert head_min >= tail_max - 1e-12, (lang, head_min, tail_max)


def test_containment_finds_planted_excerpt(spark, tmp_path):
    """A short doc whose text is a verbatim slice of a long doc has
    containment ~1.0 toward it (the pair symmetric Jaccard misses),
    and the long doc is NOT contained in the short one."""
    import shutil

    long_toks = [f"w{i}" for i in range(120)]
    rows = [
        (1, " ".join(long_toks), "en", "web", 0),
        (2, " ".join(long_toks[40:60]), "en", "web", 0),  # 20-token slice
        (3, " ".join(f"z{i}" for i in range(50)), "en", "web", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    df.coalesce(1).write.parquet(str(sf_dir / "documents.parquet"))
    # satisfy load_table for the other tables the loader may touch
    out = QUERIES["dedup_containment"](spark, str(sf_dir)).collect()
    pairs = {(r.doc_a, r.doc_b): r.containment for r in out}
    assert pairs.get((2, 1), 0) > 0.99
    assert (1, 2) not in pairs  # asymmetric: the superset is not contained
    assert not any(3 in p for p in pairs)


def test_keep_best_prefers_quality_then_length(spark, tmp_path):
    """dedup_keep_best (round 12): a planted near-dup cluster keeps the
    member with the best (keep-flag, token-count, doc_id) key — NOT the
    minimum-id canonical doc — and singleton clusters keep their only
    member."""
    base = [f"common token number {i} flows onward" for i in range(30)]
    long_txt = " ".join(" ".join(base).split())
    # doc 1: near-dup of doc 2 but digit-heavy (fails the quality keep
    # rule: digit_ratio >= 0.2) — must LOSE despite the smaller id
    noisy = long_txt + " " + " ".join("1234567890" for _ in range(40))
    rows = [
        (1, noisy, "en", "web", 0),
        (2, long_txt + " extra tail words here", "en", "web", 0),
        (3, "a tiny unrelated document with some words", "en", "web", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    df.coalesce(1).write.parquet(str(sf_dir / "documents.parquet"))
    out = {r.doc_id: r for r in QUERIES["dedup_keep_best"](spark, str(sf_dir)).collect()}
    assert out[1].cluster_id == out[2].cluster_id  # planted near-dups
    assert out[1].n_members == 2
    assert not out[1].kept and out[2].kept  # quality beats smaller id
    assert out[3].kept and out[3].n_members == 1  # singleton keeps
    # exactly one kept per cluster
    from collections import Counter

    per = Counter(r.cluster_id for r in out.values() if r.kept)
    assert all(v == 1 for v in per.values())


def test_nb_quality_classifier_learns_and_generalizes(spark, sf_small):
    """docs_nb_quality_classifier (round 13): the semantics the oracle
    hash can't show — the trained model actually discriminates. It
    (a) reproduces its weak labels on the vast majority of the corpus,
    (b) predicts BOTH classes (a degenerate always-one-class model
    would still hash-match an equally degenerate oracle), (c) ranks
    rule-good docs above rule-bad ones on average, and (d) confines
    its disagreements to the MIN_WORDS rule boundary (the mixed
    length-feature bin) — graded evidence where the rule has a cliff."""
    from flink_cep_examples_spark.queries.curation import (
        MIN_WORDS,
        NBQ_LEN_BIN_WIDTH,
    )

    rows = QUERIES["docs_nb_quality_classifier"](spark, sf_small).collect()
    n = len(rows)
    agree = sum(r.rule_good == r.pred_good for r in rows)
    assert agree / n >= 0.9
    preds = {r.pred_good for r in rows}
    assert preds == {True, False}
    good = [r.log_odds for r in rows if r.rule_good]
    bad = [r.log_odds for r in rows if not r.rule_good]
    assert sum(good) / len(good) > 0 > sum(bad) / len(bad)
    # disagreements only inside the length bin straddling MIN_WORDS
    # (n_feats = n_words + 1 doc-statistic feature)
    lo = (MIN_WORDS // NBQ_LEN_BIN_WIDTH) * NBQ_LEN_BIN_WIDTH
    for r in rows:
        if r.rule_good != r.pred_good:
            assert lo <= r.n_feats - 1 < lo + NBQ_LEN_BIN_WIDTH, r


def test_nb_quality_classifier_model_is_broadcast(spark, sf_small):
    """The B+16-row model and the scalar prior join the corpus by
    broadcast; the corpus never shuffles on a model key."""
    out = QUERIES["docs_nb_quality_classifier"](spark, sf_small)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p


def test_bigram_logprob_sees_word_order_where_unigram_cannot(
    spark, tmp_path
):
    """docs_bigram_logprob (round 13): planted corpus with two docs of
    the IDENTICAL token multiset — one in the corpus-frequent order,
    one shuffled. The unigram LM scores them exactly equal (it cannot
    see order); the interpolated bigram LM must rank the in-order doc
    strictly higher — the reason pipelines move up a model order."""
    phrase = "the quick brown fox jumps over the lazy dog"
    rows = [(i, phrase + " " + phrase, "en", "s", 0) for i in range(10)]
    in_order = phrase + " " + phrase
    toks = in_order.split()
    shuffled = " ".join(
        toks[i] for i in [3, 0, 7, 12, 1, 9, 16, 5, 14, 2, 11, 17, 4, 10, 6, 15, 8, 13]
    )
    assert sorted(shuffled.split()) == sorted(toks)
    rows += [(100, in_order, "en", "s", 0), (101, shuffled, "en", "s", 0)]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    df.coalesce(1).write.parquet(str(sf_dir / "documents.parquet"))
    uni = {
        r.doc_id: r.avg_logprob
        for r in QUERIES["docs_unigram_logprob"](spark, str(sf_dir)).collect()
    }
    bi = {
        r.doc_id: r.avg_logprob
        for r in QUERIES["docs_bigram_logprob"](spark, str(sf_dir)).collect()
    }
    assert uni[100] == uni[101]  # unigram is order-blind: exact tie
    assert bi[100] > bi[101] + 0.5  # bigram separates decisively
