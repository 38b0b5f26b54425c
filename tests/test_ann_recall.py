"""Recall gate for the parameterized LSH search (VERDICT r2 item 3).

The driver corpus is weakly clustered (neighbor cos ~ 0.45), where any
sub-scan candidate generator has low recall — the honest measurement in
similarity.py's tuning note. A *search component* is judged on the
workload it exists for: near-duplicate retrieval, planted pairs at
cos >= 0.9. This test builds that corpus synthetically, picks
(n_planes, probe_radius) with lsh_params(n), and gates top-1 recall
>= 0.8 (analytically ~0.97 at these settings; the margin absorbs rng
geometry)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from flink_cep_examples_spark.queries.similarity import (
    N_PLANES,
    PLANES,
    lsh_params,
    lsh_search,
    make_planes,
    make_probe_masks,
)


def _clustered_corpus(n_base: int = 300, dim: int = 64, eps: float = 0.3):
    """n_base unit vectors + one planted near-dup each (cos ~ 0.96)."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    noise = rng.normal(size=(n_base, dim))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    dup = base + eps * noise
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    return base, dup, (base * dup).sum(axis=1)


def test_lsh_recall_on_near_dup_corpus(spark):
    base, dup, pair_cos = _clustered_corpus()
    n_base = len(base)
    assert (pair_cos >= 0.9).mean() > 0.95  # the plant is a real near-dup set

    vecs = np.vstack([base, dup])
    rows = [
        (i, "base" if i < n_base else "dup", [float(x) for x in vecs[i]])
        for i in range(2 * n_base)
    ]
    df = spark.createDataFrame(
        rows, schema="vec_id long, label string, embedding array<double>"
    )

    n_planes, radius = lsh_params(2 * n_base)
    out = lsh_search(
        df,
        F.col("vec_id") >= n_base,  # every dup queries for its base
        k=1,
        n_planes=n_planes,
        probe_radius=radius,
    )
    top1 = {r.q_id: r.vec_id for r in out.collect()}

    eligible = [i for i in range(n_base) if pair_cos[i] >= 0.9]
    hits = sum(1 for i in eligible if top1.get(n_base + i) == i)
    recall = hits / len(eligible)
    assert recall >= 0.8, f"top-1 recall {recall:.2f} at planes={n_planes} r={radius}"


def test_lsh_params_scale_with_corpus():
    """Buckets stay ~constant-occupancy as the corpus grows: n_planes
    is log2-ish in n, so candidate volume per query doesn't scale with
    corpus size."""
    p_small, _ = lsh_params(10_000)
    p_big, _ = lsh_params(10_000_000)
    assert p_big > p_small
    assert abs((10_000_000 / 2**p_big) - (10_000 / 2**p_small)) < 200


def test_planes_are_prefix_stable():
    """An index hashed at 24 planes can be probed at any narrower
    width without rehashing — plane j is independent of n_planes."""
    assert make_planes(8) == make_planes(24)[:8]
    assert PLANES == make_planes(N_PLANES)


def test_probe_masks_cover_ball_exactly():
    masks = make_probe_masks(8, 2)
    assert len(masks) == 1 + 8 + 28
    assert all(bin(m).count("1") <= 2 for m in masks)


def test_ivf_cluster_count_scales_with_corpus():
    """semdedup/IVF knob: K = n/target keeps cluster size constant, so
    within-cluster pair volume (quadratic in cluster size) stays
    linear in n."""
    from flink_cep_examples_spark.queries.ivf import n_lists

    assert n_lists(2_000) == 7
    assert n_lists(2_000_000) == 7812
    assert n_lists(2_000_000) / n_lists(2_000) > 500  # ~linear in n
    assert n_lists(10) == 2  # floor


def test_trained_assignment_accepts_k(spark, sf_small):
    from pyspark.sql import functions as F

    from flink_cep_examples_spark.queries.ivf import _trained_assignment
    from flink_cep_examples_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    assigned, cents = _trained_assignment(emb, k_lists=4)
    assert len(cents) == 4
    assert assigned.select("cid").distinct().count() <= 4


def test_blas_assignment_agrees_with_exact_kernel(spark):
    """The k_lists=None deployment path swaps the sequential-fold
    assignment kernel for a BLAS matmul (ivf._assign exact=False).
    Same centroids, same corpus → identical cid per vector (argmin ties
    break to the smallest cid in both; ulp-level reassociation noise
    cannot flip an argmin on this corpus)."""
    from flink_cep_examples_spark.queries.ivf import (
        _assign,
        _trained_assignment,
    )
    from flink_cep_examples_spark.sources.tables import load_table, spread

    emb = (
        spread(load_table(spark, "/root/testdata/sf0.01", "embeddings"), "vec_id")
        .select("vec_id", "label", "embedding")
        .localCheckpoint()
    )
    _, cents = _trained_assignment(emb, k_lists=8, exact=True)
    a_exact = {
        r.vec_id: r.cid
        for r in _assign(emb, cents, exact=True).select("vec_id", "cid").collect()
    }
    a_blas = {
        r.vec_id: r.cid
        for r in _assign(emb, cents, exact=False).select("vec_id", "cid").collect()
    }
    assert a_exact == a_blas


def test_int8_quantized_topk_recall(spark, sf_small):
    """int8 scalar quantization must preserve the exact top-k almost
    perfectly (rounding error ~1/254 per component): require >= 0.8
    overlap with the float brute-force baseline at k=10."""
    from flink_cep_examples_spark.queries import QUERIES, load_all

    load_all()
    exact = [r.vec_id for r in QUERIES["ann_bruteforce_topk"](spark, sf_small).collect()]
    quant = [r.vec_id for r in QUERIES["ann_int8_topk"](spark, sf_small).collect()]
    overlap = len(set(exact) & set(quant)) / len(exact)
    assert overlap >= 0.8, (overlap, exact, quant)


def test_pq_adc_topk_recall(spark, sf_small):
    """Product quantization trades accuracy for a ~25x index shrink;
    on the ISOTROPIC synthetic corpus (PQ's worst case — no block
    structure for the codebook to exploit) measured top-10 overlap
    with the exact baseline is 0.5-0.6. The floor distinguishes a
    working encoder from a broken one (chance overlap at k=10 of 500
    is ~0.02), not a quality target for real clustered embeddings."""
    from flink_cep_examples_spark.queries import QUERIES, load_all

    load_all()
    exact = [r.vec_id for r in QUERIES["ann_bruteforce_topk"](spark, sf_small).collect()]
    pq = [r.vec_id for r in QUERIES["ann_pq_topk"](spark, sf_small).collect()]
    overlap = len(set(exact) & set(pq)) / len(exact)
    assert overlap >= 0.4, (overlap, exact, pq)


def test_ivfadc_topk_recall_and_pruning(spark, sf_small):
    """IVFADC composes IVF pruning with PQ scoring, so its top-10
    overlap with the exact baseline is bounded ABOVE by both halves';
    the floor (chance ~0.02) distinguishes a working composite from a
    broken one. (The pruning itself is pinned exactly by the DuckDB
    oracle, whose ``pruned`` CTE reproduces the probed lists.)"""
    from flink_cep_examples_spark.queries import QUERIES, load_all

    load_all()
    exact = [
        r.vec_id
        for r in QUERIES["ann_bruteforce_topk"](spark, sf_small).collect()
    ]
    ivfadc = QUERIES["ann_ivfadc_topk"](spark, sf_small).collect()
    got = [r.vec_id for r in ivfadc]
    assert len(got) == len(exact)
    overlap = len(set(exact) & set(got)) / len(exact)
    assert overlap >= 0.2, (overlap, exact, got)
    for r in ivfadc:
        assert -1.0000001 <= r.cos <= 1.0000001


def test_mmr_topk_diversifies(spark, tmp_path):
    """ann_mmr_topk (round 12): with a redundant near-dup sitting at
    cosine rank 2, MMR must skip it for a more diverse candidate —
    plain top-k cannot — and every pick's score must satisfy the MMR
    recurrence computed independently in numpy."""
    # two lobes equally relevant to q: d1/d2 are near-duplicates in
    # the +y lobe, d3 sits alone in the -y lobe. Plain cosine ranks
    # the d1/d2 pair 1-2; MMR's redundancy penalty (sim(d1,d2) ~ 1 vs
    # sim(d1,d3) ~ 0.62) must pull d3 into pick 2.
    q = np.array([1.0, 0.0, 0.0, 0.0])
    d1 = np.array([0.9, 0.436, 0.0, 0.0])
    d2 = np.array([0.9, 0.435, 0.01, 0.0])  # ~duplicate of d1
    d3 = np.array([0.9, -0.436, 0.0, 0.0])  # the other lobe
    d4 = np.array([0.5, 0.0, 0.866, 0.0])  # least relevant
    vecs = {0: q, 1: d1, 2: d2, 3: d3, 4: d4}
    rows = [(i, "x", [float(v) for v in vec]) for i, vec in vecs.items()]
    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    ).coalesce(1).write.parquet(str(sf_dir / "embeddings.parquet"))

    from flink_cep_examples_spark.queries import QUERIES, load_all
    from flink_cep_examples_spark.queries.similarity import (
        MMR_K,
        MMR_LAM,
        MMR_MU,
    )

    load_all()
    out = sorted(
        QUERIES["ann_mmr_topk"](spark, str(sf_dir)).collect(),
        key=lambda r: r.rk,
    )
    assert len(out) == min(MMR_K, 4)
    picks = [r.vec_id for r in out]

    def cos(a, b):
        va, vb = vecs[a], vecs[b]
        return float(
            va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        )

    # independent numpy greedy (same tiebreak)
    remaining = {i: cos(0, i) for i in (1, 2, 3, 4)}
    sel, expect = [], []
    while remaining and len(expect) < MMR_K:
        scored = {
            i: MMR_LAM * c - MMR_MU * max(
                (cos(i, s) for s in sel), default=0.0
            )
            for i, c in remaining.items()
        }
        best = min(scored, key=lambda i: (-scored[i], i))
        expect.append(best)
        sel.append(best)
        del remaining[best]
    assert picks == expect
    # diversity actually kicked in: pick 2 is NOT the cosine-rank-2
    # candidate (the near-dup of pick 1), and the dup pair does not
    # occupy the first two picks
    cos_order = sorted((1, 2, 3, 4), key=lambda i: (-cos(0, i), i))
    assert picks[1] != cos_order[1]
    assert set(picks[:2]) != {1, 2}
    assert picks[1] == 3  # the other lobe's representative
    for r in out:
        ms = max(
            (cos(r.vec_id, s) for s in picks[: r.rk - 1]), default=0.0
        )
        assert abs(r.mmr - (MMR_LAM * r.cos - MMR_MU * ms)) < 1e-6


def test_mmr_ivf_topk_recall_vs_exact(spark, sf_small):
    """The 100-TB MMR composition (round 13): candidates from the
    partition-pruned IVF stage instead of the exact brute scorer.
    Gate: the IVF-MMR picks recover most of the exact-MMR picks (the
    IVF pool covers the query's neighborhood unless the probe misses
    a lobe), and the rerank arithmetic is IDENTICAL — any shared pick
    carries the same cos, and pick 1 (no diversity term yet) agrees
    whenever the IVF pool contains the exact top-1."""
    from flink_cep_examples_spark.queries.ivf import ann_mmr_ivf_topk
    from flink_cep_examples_spark.queries.similarity import (
        MMR_K,
        ann_mmr_topk,
    )

    exact = {r.rk: r for r in ann_mmr_topk(spark, sf_small).collect()}
    ivf = {r.rk: r for r in ann_mmr_ivf_topk(spark, sf_small).collect()}
    assert len(exact) == len(ivf) == MMR_K
    exact_ids = {r.vec_id for r in exact.values()}
    ivf_ids = {r.vec_id for r in ivf.values()}
    overlap = len(exact_ids & ivf_ids) / MMR_K
    assert overlap >= 0.6, f"IVF-MMR pick recall {overlap:.2f}"
    # shared picks score identically (same candidate cos + same greedy)
    exact_cos = {r.vec_id: r.cos for r in exact.values()}
    for r in ivf.values():
        if r.vec_id in exact_cos:
            assert abs(r.cos - exact_cos[r.vec_id]) < 1e-9


def test_hybrid_rrf_fuses_both_arms(spark, sf_small):
    """docs_hybrid_rrf_topk (round 14): the semantics the oracle hash
    can't show — fusion actually mixes the two arms. Pins (a) every
    returned rrf equals the closed-form 1/(60+r) fold of its own rank
    columns, (b) the result draws from BOTH arms (not one arm
    reranked), (c) a doc ranked by both arms outranks a doc holding
    the same best rank in only one arm, (d) rank columns stay inside
    [0, TOP_K] with 0 = absent."""
    from flink_cep_examples_spark.queries import QUERIES, load_all
    from flink_cep_examples_spark.queries.similarity import RRF_K, TOP_K

    load_all()
    rows = QUERIES["docs_hybrid_rrf_topk"](spark, sf_small).collect()
    assert 0 < len(rows) <= TOP_K
    for r in rows:
        assert 0 <= r.r_lex <= TOP_K and 0 <= r.r_sem <= TOP_K
        assert (r.r_lex, r.r_sem) != (0, 0)
        want = (1.0 / (RRF_K + r.r_lex) if r.r_lex else 0.0) + (
            1.0 / (RRF_K + r.r_sem) if r.r_sem else 0.0
        )
        assert r.rrf == want
    assert any(r.r_lex > 0 for r in rows)
    assert any(r.r_sem > 0 for r in rows)
    both = [r for r in rows if r.r_lex and r.r_sem]
    solo = [r for r in rows if bool(r.r_lex) != bool(r.r_sem)]
    for b in both:
        for s in solo:
            if min(b.r_lex, b.r_sem) <= (s.r_lex or s.r_sem):
                assert b.rrf > s.rrf


def test_serve_many_matches_single_query_serving(spark, sf_small):
    """ann_serve_many_persisted_topk (round 14): the batched serve must
    be exactly |Q| single-query serves — per-qid slices equal
    ivf_search_persisted's rows for that query — off ONE
    partition-pruned scan (PartitionFilters on cid), TOP_K rows per
    query, never a self-hit."""
    import hashlib
    import tempfile

    from flink_cep_examples_spark.queries import QUERIES, load_all
    from flink_cep_examples_spark.queries.ivf import (
        QUERY_VEC_IDS,
        ivf_search_persisted,
        ivf_search_persisted_many,
    )
    from flink_cep_examples_spark.queries.similarity import TOP_K

    load_all()
    rows = QUERIES["ann_serve_many_persisted_topk"](
        spark, sf_small
    ).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        assert r.vec_id != r.qid  # no self-hits
        by_q.setdefault(r.qid, []).append(r)
    assert set(by_q) == set(QUERY_VEC_IDS)
    for q, rs in by_q.items():
        assert len(rs) == TOP_K

    tag = hashlib.md5(sf_small.encode()).hexdigest()[:10]
    index_dir = f"{tempfile.gettempdir()}/spark_graft_ivf_index_{tag}"
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    queries = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in emb.filter(
            emb.vec_id.isin(list(QUERY_VEC_IDS))
        ).collect()
    }
    for qid in QUERY_VEC_IDS:
        single = ivf_search_persisted(
            spark, index_dir, queries[qid], exclude_vec_id=qid
        ).collect()
        got = [(r.vec_id, r.label, r.cid, r.cos) for r in by_q[qid]]
        want = [(r.vec_id, r.label, r.cid, r.cos) for r in single]
        assert got == want, qid

    # one pruned scan: the plan's lists read carries PartitionFilters
    plan = (
        ivf_search_persisted_many(spark, index_dir, queries)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan_lines = [
        l for l in plan.splitlines() if "PartitionFilters" in l
    ]
    assert any("cid" in l for l in scan_lines), scan_lines


def test_persisted_hybrid_overlap_vs_brute_hybrid(spark, sf_small):
    """VERDICT r14 item 5: the end-to-end serving-fidelity gate.
    ``hybrid_rrf_persisted_topk`` differs from ``docs_hybrid_rrf_topk``
    exactly where IVF is approximate (the semantic arm's candidate
    pool); the lexical arm is EXACT in both (the partition-pruned BM25
    index prunes buckets, never postings). Pins:

    - top-K overlap between the two fused lists ≥ 0.6 (the serving
      answer recovers most of the exact hybrid — same floor as the
      IVF-MMR recall gate; chance overlap at corpus scale is ~0);
    - shared docs carry IDENTICAL lexical ranks (the exact arm cannot
      drift between the two tiers);
    - a doc the persisted tier ranks in its semantic arm is in the
      brute tier's semantic arm too whenever both return it (IVF's
      candidate list is a SUBSET of the brute ranking's pool, so a
      sem-arm hit can be lost to pruning but never invented)."""
    from flink_cep_examples_spark.queries import QUERIES, load_all

    load_all()
    brute = {
        r.doc_id: r for r in QUERIES["docs_hybrid_rrf_topk"](
            spark, sf_small
        ).collect()
    }
    served = {
        r.doc_id: r for r in QUERIES["hybrid_rrf_persisted_topk"](
            spark, sf_small
        ).collect()
    }
    assert brute and served
    overlap = len(brute.keys() & served.keys()) / max(
        len(brute), len(served)
    )
    assert overlap >= 0.6, f"persisted-hybrid top-K overlap {overlap:.2f}"
    for doc_id in brute.keys() & served.keys():
        assert brute[doc_id].r_lex == served[doc_id].r_lex, doc_id
        if served[doc_id].r_sem and brute[doc_id].r_sem == 0:
            raise AssertionError(
                f"doc {doc_id}: persisted sem arm invented a hit the "
                "brute ranking does not have"
            )


def test_semantic_decontam_ivf_subset_of_exact(spark, sf_small):
    """docs_semantic_decontaminate_ivf (round 15): the big-eval-set
    swap. Pins the structural guarantees the approximation makes:

    - SOUNDNESS: every flagged vector is flagged by the exact sweep
      too (IVF can only MISS a contaminated vector — its list outside
      every matching eval vector's probes — never invent one);
    - per shared vector, n_hits ≤ exact n_hits and max_cos ≤ exact
      max_cos bit-wise-compatibly (the hit set is a subset and the
      cosine arithmetic is the same expression tree);
    - measured recall reported as a floor so a quantizer regression
      shows up (chance is ~0; the probe route must recover a
      meaningful share of exact flags)."""
    from flink_cep_examples_spark.queries import QUERIES, load_all

    load_all()
    exact = {
        r.vec_id: r
        for r in QUERIES["docs_semantic_decontaminate"](
            spark, sf_small
        ).collect()
    }
    ivf = {
        r.vec_id: r
        for r in QUERIES["docs_semantic_decontaminate_ivf"](
            spark, sf_small
        ).collect()
    }
    assert exact and ivf
    invented = set(ivf) - set(exact)
    assert not invented, sorted(invented)[:5]
    for vec_id, r in ivf.items():
        assert r.n_hits <= exact[vec_id].n_hits, vec_id
        assert r.max_cos <= exact[vec_id].max_cos + 1e-12, vec_id
    recall = len(ivf) / len(exact)
    assert recall >= 0.3, f"IVF decontam flag recall {recall:.2f}"
