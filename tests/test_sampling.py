"""Mixture rebalancing semantics the oracle can't express: the derived
rates actually move the realized mixture toward the target."""

from __future__ import annotations

from flink_cep_examples_spark.queries import QUERIES, load_all

load_all()


def test_mixture_sample_rebalances_toward_target(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    n_in = {r.lang: r.n for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    out = QUERIES["docs_mixture_sample"](spark, sf_small)
    rows = out.collect()
    n_out = {}
    for r in rows:
        n_out[r.lang] = n_out.get(r.lang, 0) + 1
    total_in, total_out = sum(n_in.values()), sum(n_out.values())
    assert 0 < total_out < total_in
    target = {"en": 0.30, "de": 0.20, "es": 0.20, "fr": 0.15, "zh": 0.15}
    for lang, share in target.items():
        got = n_out[lang] / total_out
        # realized share lands near the target (hash-threshold noise is
        # a few rows at this corpus size)...
        assert abs(got - share) < 0.03, (lang, got, share)
        # ...and never further from it than the input mixture was
        assert abs(got - share) <= abs(n_in[lang] / total_in - share) + 0.03
    # no language gains absolute rows; the binding language (the one
    # whose count set T) is kept in full at rate 1.0
    for lang, k in n_out.items():
        assert k <= n_in[lang]
    binding = min(n_in, key=lambda l: n_in[l] * 100 // (target[l] * 100))
    assert n_out[binding] == n_in[binding]


def test_mixture_sample_is_deterministic(spark, sf_small):
    a = sorted(r.doc_id for r in QUERIES["docs_mixture_sample"](spark, sf_small).collect())
    b = sorted(r.doc_id for r in QUERIES["docs_mixture_sample"](spark, sf_small).collect())
    assert a == b and len(a) > 0


def test_token_budget_mix_fills_budget_exactly(spark, sf_small):
    """docs_token_budget_mix (round 13) semantics the oracle restates
    but a reader can't see from a hash match: per language, the kept
    token mass meets the budget and overshoots by at most the single
    boundary document — i.e. the selection is the exact minimal prefix
    of the deterministic hash order that covers the budget."""
    from flink_cep_examples_spark.queries.sampling import (
        _MIX,
        _MOD,
        _TB_PCT,
        _TB_PCT_DEFAULT,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").collect()
    total = {}
    for r in docs:
        total[r.lang] = total.get(r.lang, 0) + (r.n_chars + 3) // 4
    budget = {
        lang: t * _TB_PCT.get(lang, _TB_PCT_DEFAULT) // 100
        for lang, t in total.items()
    }
    out = QUERIES["docs_token_budget_mix"](spark, sf_small).collect()
    kept = {}
    for r in out:
        kept.setdefault(r.lang, []).append(r)
    assert set(kept) == {lang for lang, b in budget.items() if b > 0}
    for lang, rows in kept.items():
        rows.sort(key=lambda r: ((r.doc_id * _MIX) % _MOD, r.doc_id))
        mass = sum(r.tok for r in rows)
        # budget met (strictly fewer total tokens than the corpus has,
        # so a boundary doc always exists)...
        assert mass >= budget[lang], (lang, mass, budget[lang])
        assert mass < total[lang]
        # ...and dropping the hash-order-last kept doc falls below it:
        # minimal prefix, overshoot bounded by one document
        assert mass - rows[-1].tok < budget[lang], (lang, mass)


def test_token_budget_mix_is_deterministic(spark, sf_small):
    a = sorted(r.doc_id for r in QUERIES["docs_token_budget_mix"](spark, sf_small).collect())
    b = sorted(r.doc_id for r in QUERIES["docs_token_budget_mix"](spark, sf_small).collect())
    assert a == b and len(a) > 0


def test_hll_distinct_accuracy_and_state_bound(spark, sf_small):
    """HLL semantics the oracle can't express: the estimate is NEAR the
    true distinct count (explicitly approximate — the catalog oracle
    pins bit-exactness, this pins meaning), and the sketch state is
    bounded at m=256 buckets per type (the 100 TB claim)."""
    import duckdb

    from flink_cep_examples_spark.queries.sampling import _HLL_M

    out = {r.event_type: r for r in QUERIES["events_hll_distinct"](spark, sf_small).collect()}
    con = duckdb.connect()
    exact = dict(
        con.execute(
            f"SELECT event_type, COUNT(DISTINCT user_id) "
            f"FROM '{sf_small}/events.parquet' GROUP BY 1"
        ).fetchall()
    )
    con.close()
    assert set(out) == set(exact)
    for t, true_n in exact.items():
        r = out[t]
        # 1.04/sqrt(256) = 6.5% standard error; allow 3 sigma
        assert abs(r.est_distinct - true_n) / true_n < 0.20, (t, r, true_n)
        # state bound: zero + hit buckets tile the m-bucket register file
        assert 0 <= r.n_zero < _HLL_M
        # scaled harmonic denominator is positive and <= m * 2^25
        assert 0 < r.denom_q <= _HLL_M * (1 << 25)


def test_hll_distinct_is_deterministic(spark, sf_small):
    a = sorted(map(tuple, QUERIES["events_hll_distinct"](spark, sf_small).collect()))
    b = sorted(map(tuple, QUERIES["events_hll_distinct"](spark, sf_small).collect()))
    assert a == b and len(a) > 0


def test_cms_overestimates_and_merges(spark, sf_small):
    """CMS guarantee the oracle can't express: est >= true for every
    probed heavy hitter, and counter states merge by SUM (split the
    corpus, sum the counter tables, probe → same estimates)."""
    from pyspark.sql import functions as F

    out = QUERIES["events_cms_heavy_hitters"](spark, sf_small).collect()
    assert len(out) > 0
    for r in out:
        assert r.est_cnt >= r.true_cnt, r
        assert 1 <= r.rnk <= 5
    # merge-by-sum: counters built on two disjoint halves, summed,
    # equal the whole-corpus counters
    from flink_cep_examples_spark.queries.sampling import _cms_bucket_sql

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    bucket = F.expr(_cms_bucket_sql("user_id", "div"))

    def counters(df):
        return (
            df.select(
                "event_type",
                F.explode(F.sequence(F.lit(0), F.lit(3))).alias("d"),
                "user_id",
            )
            .select("event_type", "d", bucket.alias("bucket"))
            .groupBy("event_type", "d", "bucket")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    whole = {
        (r.event_type, r.d, r.bucket): r.c for r in counters(ev).collect()
    }
    lo = counters(ev.filter("event_id % 2 = 0")).collect()
    hi = counters(ev.filter("event_id % 2 = 1")).collect()
    merged: dict = {}
    for r in [*lo, *hi]:
        k = (r.event_type, r.d, r.bucket)
        merged[k] = merged.get(k, 0) + r.c
    assert merged == whole


def test_hourly_hll_rollup_merge_equals_flat(spark, sf_small):
    """The rolled-up per-type estimate (hour registers merged by
    bucket-wise MAX) must equal the flat whole-corpus HLL bit-for-bit
    — the continuous-aggregate property."""
    flat = {
        r.event_type: r.est_distinct
        for r in QUERIES["events_hll_distinct"](spark, sf_small).collect()
    }
    rolled = {
        r.event_type: r.est_total
        for r in QUERIES["events_hourly_hll"](spark, sf_small).collect()
    }
    assert rolled == flat


def test_quality_weighted_sample_curve_and_penalties(spark, tmp_path):
    """docs_quality_weighted_sample (round 12): the keep rate follows
    the saturating length curve (longer docs → higher rate, asymptote
    1e6), digit-/punct-heavy docs get their rate floor-divided (÷4 /
    ÷2, composable), and membership is the deterministic hash
    threshold — kept ⇔ mix(doc_id) % 1e6 < rate_ppm."""
    from flink_cep_examples_spark.queries import QUERIES, load_all
    from flink_cep_examples_spark.queries.sampling import (
        _MIX,
        _MOD,
        _QW_C,
        _QW_PPM,
    )

    load_all()
    clean_short = " ".join(f"w{i}" for i in range(10))
    clean_long = " ".join(f"w{i}" for i in range(400))
    digit_heavy = " ".join("12345" for _ in range(50))
    punct_heavy = " ".join("a..," for _ in range(50))
    both_heavy = " ".join("1.2," for _ in range(50))
    texts = {
        1: clean_short, 2: clean_long, 3: digit_heavy,
        4: punct_heavy, 5: both_heavy,
    }
    rows = [(i, t, "en", "web", 0) for i, t in texts.items()]
    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(sf_dir / "documents.parquet"))
    # rates are observable only on kept rows; compute them all by
    # re-deriving the curve and checking the kept set exactly
    out = {
        r.doc_id: r
        for r in QUERIES["docs_quality_weighted_sample"](
            spark, str(sf_dir)
        ).collect()
    }

    def expect_rate(i):
        t = texts[i]
        nt = max(len(t.split()), 1)
        nd = sum(c.isdigit() for c in t)
        np_ = sum(c in ".,;:!?" for c in t)
        n = len(t)
        rate = (_QW_PPM * nt) // (nt + _QW_C)
        if nd * 5 >= n:
            rate //= 4
        if np_ * 10 >= n:
            rate //= 2
        return rate

    for i in texts:
        kept = (i * _MIX) % _MOD % _QW_PPM < expect_rate(i)
        assert (i in out) == kept, i
        if i in out:
            assert out[i].rate_ppm == expect_rate(i), i
    # curve shape: longer clean doc has a strictly higher rate, and
    # the penalties bite (digit ÷4, punct ÷2, both ÷8)
    r = {i: expect_rate(i) for i in texts}
    assert r[2] > r[1]
    base50 = (_QW_PPM * 50) // (50 + _QW_C)
    assert r[3] == base50 // 4
    assert r[4] == base50 // 2
    assert r[5] == base50 // 4 // 2


def test_token_budget_mix_edge_cases(spark, tmp_path):
    """Constructed corpus: a single-doc language is kept whole (its
    budget is positive and the doc is the boundary doc), an all-empty
    language has budget 0 and admits nothing, and zero-token docs
    after the boundary never sneak in."""
    rows = [
        # lang aa: one real doc — budget = 55% of 25 = 13, doc kept
        (1, "x", "aa", "s", 100),
        # lang bb: only empty docs — budget 0, nothing kept
        (2, "", "bb", "s", 0),
        (3, "", "bb", "s", 0),
        # lang cc: two docs; budget = 55% of (25+25) = 27 → the
        # hash-order first doc leaves cum=25 < 27, second starts at
        # 25 < 27 too → both kept (boundary doc included)... then a
        # zero-token doc at cum 50 >= 27 stays OUT
        (4, "y", "cc", "s", 100),
        (5, "z", "cc", "s", 100),
        (6, "", "cc", "s", 0),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    df.coalesce(1).write.parquet(str(sf_dir / "documents.parquet"))
    out = QUERIES["docs_token_budget_mix"](spark, str(sf_dir)).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert by_lang.get("aa") == {1}
    assert "bb" not in by_lang
    assert by_lang.get("cc") == {4, 5}


def test_token_budget_prefix_respects_joined_input(spark, sf_small):
    """Round-13 regression: token_budget_prefix over a LAZY joined
    input (anti-join + semi-join lineage, the composed ingest
    pipeline's shape) must emit only rows from its input — Spark's
    ambiguous-self-join resolution silently dropped the upstream join
    filters on one branch before the live-bucket table was
    materialized through the driver, emitting a doc not in the input.
    The kept set must also equal the prefix over the same rows
    materialized (lineage-free control)."""
    from flink_cep_examples_spark.queries.sampling import (
        token_budget_prefix,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    drop = docs.filter("doc_id % 7 = 0").select("doc_id")
    keep = docs.filter("n_chars % 3 != 1").select("doc_id")
    surv = (
        docs.select("doc_id", "lang", "n_chars")
        .join(drop, "doc_id", "left_anti")
        .join(keep, "doc_id")
    )
    surv_ids = {r.doc_id for r in surv.collect()}
    lazy = {r.doc_id for r in token_budget_prefix(surv).collect()}
    assert lazy <= surv_ids, sorted(lazy - surv_ids)[:5]
    control_df = spark.createDataFrame(surv.collect(), surv.schema)
    control = {r.doc_id for r in token_budget_prefix(control_df).collect()}
    assert lazy == control


def test_temperature_mix_smooths_language_shares(spark, sf_small):
    """docs_temperature_mix (round 14): the semantics the oracle hash
    can't show — α=0.5 smoothing actually rebalances. Pins (a) every
    language's selected token mass meets its sqrt-proportional budget
    (or the language is exhausted), overshooting by at most one doc,
    (b) the HEAD language's share of selected tokens is strictly
    below its natural corpus share while the smallest language's is
    strictly above (the reason the recipe exists), (c) budgets sum to
    ≤ the 40% global budget."""
    from flink_cep_examples_spark.queries import QUERIES, load_all
    from flink_cep_examples_spark.queries.sampling import (
        _TM_PCT,
        _temperature_budget_rule,
        TOKEN_PROXY_SQL,
    )
    from pyspark.sql import functions as F

    load_all()
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    mass = {
        r.lang: r.ntok
        for r in docs.groupBy("lang")
        .agg(F.sum(F.expr(TOKEN_PROXY_SQL)).alias("ntok"))
        .collect()
    }
    budgets = {
        r.lang: r.budget
        for r in _temperature_budget_rule(
            docs.groupBy("lang").agg(
                F.sum(F.expr(TOKEN_PROXY_SQL)).alias("ntok")
            )
        ).collect()
    }
    total = sum(mass.values())
    assert sum(budgets.values()) <= total * _TM_PCT // 100

    rows = QUERIES["docs_temperature_mix"](spark, sf_small).collect()
    sel = {}
    max_tok = {}
    for r in rows:
        sel[r.lang] = sel.get(r.lang, 0) + r.tok
        max_tok[r.lang] = max(max_tok.get(r.lang, 0), r.tok)
    for lang, b in budgets.items():
        got = sel.get(lang, 0)
        if got < b:  # under budget -> the language must be exhausted
            assert got == mass[lang], lang
        else:  # met -> overshoot bounded by one admitted doc
            assert got - b < max_tok[lang], lang

    head = max(mass, key=mass.get)
    tail = min(mass, key=mass.get)
    sel_total = sum(sel.values())
    assert sel[head] / sel_total < mass[head] / total
    assert sel[tail] / sel_total > mass[tail] / total


def test_training_order_interleaves_languages(spark, sf_small):
    """docs_training_order (round 15): the semantics the oracle hash
    can't show — the global order actually INTERLEAVES. Pins (a) ord
    is the dense 1..N sequence (the two-pass range-partitioned global
    index agrees with a true total order), (b) the rows are exactly
    the admitted temperature mix, (c) stride fairness: in EVERY prefix
    of the order, each language's token mass deviates from its
    proportional share of that prefix by at most ~2 of its own docs —
    the property a lang-blocked order violates maximally, (d) within
    a language, docs appear in the admission hash order."""
    from flink_cep_examples_spark.queries import QUERIES, load_all
    from flink_cep_examples_spark.queries.sampling import _MIX, _MOD

    load_all()
    rows = sorted(
        QUERIES["docs_training_order"](spark, sf_small).collect(),
        key=lambda r: r.ord,
    )
    assert [r.ord for r in rows] == list(range(1, len(rows) + 1))
    mix = QUERIES["docs_temperature_mix"](spark, sf_small).collect()
    assert {(r.doc_id, r.lang, r.tok) for r in rows} == {
        (r.doc_id, r.lang, r.tok) for r in mix
    }
    total = {}
    max_tok = {}
    for r in rows:
        total[r.lang] = total.get(r.lang, 0) + r.tok
        max_tok[r.lang] = max(max_tok.get(r.lang, 0), r.tok)
    grand = sum(total.values())
    seen = {}
    acc = 0
    for r in rows:
        seen[r.lang] = seen.get(r.lang, 0) + r.tok
        acc += r.tok
        for lang, t in total.items():
            expect = acc * t / grand
            assert abs(seen.get(lang, 0) - expect) <= 2 * max_tok[lang], (
                r.ord, lang, seen.get(lang, 0), expect
            )
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r.doc_id)
    for lang, ids in per_lang.items():
        assert ids == sorted(ids, key=lambda d: ((d * _MIX) % _MOD, d)), lang


def test_training_shards_manifest_properties(spark, sf_small):
    """docs_training_shards (round 15): the manifest semantics the
    oracle hash can't show. Pins (a) shards tile the order exactly —
    sorted by shard_id, the [first_ord, last_ord] ranges are
    contiguous, disjoint, and cover 1..N, (b) every shard's token mass
    is SHARD_TOKENS ± one doc (greedy fill by cum_before can overshoot
    by at most the boundary doc and undershoot only on the tail
    shard), (c) the interleave survives sharding: every non-tail
    shard mixes >1 language."""
    from flink_cep_examples_spark.queries import QUERIES, load_all
    from flink_cep_examples_spark.queries.sampling import SHARD_TOKENS

    load_all()
    shards = sorted(
        QUERIES["docs_training_shards"](spark, sf_small).collect(),
        key=lambda r: r.shard_id,
    )
    order = sorted(
        QUERIES["docs_training_order"](spark, sf_small).collect(),
        key=lambda r: r.ord,
    )
    assert shards and order
    max_tok = max(r.tok for r in order)
    assert shards[0].first_ord == 1
    assert shards[-1].last_ord == len(order)
    for a, b in zip(shards, shards[1:]):
        assert b.first_ord == a.last_ord + 1, (a.shard_id, b.shard_id)
    assert sum(r.n_docs for r in shards) == len(order)
    assert sum(r.n_tokens for r in shards) == sum(r.tok for r in order)
    for s in shards[:-1]:
        # a shard closes once its cum-tokens reach the target; the
        # closing doc can overshoot by < its own size
        assert s.n_tokens < SHARD_TOKENS + max_tok, s.shard_id
        assert s.n_tokens + max_tok > SHARD_TOKENS, s.shard_id
        assert s.n_langs > 1, s.shard_id


def test_training_order_hypothesis_differential(spark):
    """Hypothesis differential for the two-pass global interleave
    (round 15): random admission frames through
    ``training_order_frame`` must equal a pure-Python stride
    simulator computing the same IEEE doubles — pinning the
    range-partition + offset-table global index against a true total
    sort on adversarial shapes (single language, zero-token docs,
    heavy skew, duplicate token masses)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from flink_cep_examples_spark.queries.sampling import (
        _MIX,
        _MOD,
        training_order_frame,
    )

    langs = ["en", "de", "zh"]
    doc_s = st.tuples(
        st.integers(min_value=0, max_value=10_000),
        st.sampled_from(langs),
        st.integers(min_value=0, max_value=50),
    )
    frame_s = st.lists(doc_s, min_size=1, max_size=40).map(
        # unique doc_ids; every present language needs >=1 token so
        # frac is never 0/0 (the engine contract: an admitted language
        # always carries positive token mass — see docs_training_order)
        lambda rows: list({d: (d, l, t) for d, l, t in rows}.values())
    ).filter(
        lambda rows: all(
            sum(t for _, l2, t in rows if l2 == l) > 0
            for l in {l for _, l, _ in rows}
        )
    )

    def sim(rows):
        per = {}
        for d, l, t in rows:
            per.setdefault(l, []).append((d, t))
        keyed = []
        for l, docs in per.items():
            docs.sort(key=lambda dt: ((dt[0] * _MIX) % _MOD, dt[0]))
            total = sum(t for _, t in docs)
            c = 0
            for d, t in docs:
                keyed.append(((2.0 * c + t) / (2.0 * total), l, d, t))
                c += t
        keyed.sort(key=lambda x: (x[0], x[1], x[2]))
        return [
            (i + 1, d, l, t) for i, (_, l, d, t) in enumerate(keyed)
        ]

    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(frame_s)
    def run(rows):
        mix = spark.createDataFrame(
            rows, "doc_id bigint, lang string, tok bigint"
        )
        got = sorted(
            (r.ord, r.doc_id, r.lang, r.tok)
            for r in training_order_frame(mix).collect()
        )
        assert got == sim(rows)

    run()


def test_curriculum_order_quality_descends_within_language(spark, sf_small):
    """docs_curriculum_order (round 15): the semantics the oracle hash
    can't show. Pins (a) rows = the admitted temperature mix (the
    curriculum reorders, never reselects), (b) within every language
    the NB log-odds are non-increasing along the order (cleanest
    first), (c) the language interleave survives the reorder — every
    prefix's per-language token mass stays within ~2 docs of its
    proportional share, exactly as the hash-order variant pins."""
    from flink_cep_examples_spark.queries import QUERIES, load_all

    load_all()
    rows = sorted(
        QUERIES["docs_curriculum_order"](spark, sf_small).collect(),
        key=lambda r: r.ord,
    )
    assert [r.ord for r in rows] == list(range(1, len(rows) + 1))
    mix = QUERIES["docs_temperature_mix"](spark, sf_small).collect()
    assert {(r.doc_id, r.lang, r.tok) for r in rows} == {
        (r.doc_id, r.lang, r.tok) for r in mix
    }
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r.log_odds)
    for lang, scores in per_lang.items():
        assert all(a >= b for a, b in zip(scores, scores[1:])), lang
    total, max_tok = {}, {}
    for r in rows:
        total[r.lang] = total.get(r.lang, 0) + r.tok
        max_tok[r.lang] = max(max_tok.get(r.lang, 0), r.tok)
    grand = sum(total.values())
    seen, acc = {}, 0
    for r in rows:
        seen[r.lang] = seen.get(r.lang, 0) + r.tok
        acc += r.tok
        for lang, t in total.items():
            expect = acc * t / grand
            assert abs(seen.get(lang, 0) - expect) <= 2 * max_tok[lang], (
                r.ord, lang
            )
