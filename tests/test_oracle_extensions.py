"""Every non-CEP catalog query vs its DuckDB oracle at sf0.001 (fast
suite gate; the driver re-runs the same contract at sf0.01), plus
semantic checks the oracle can't express: LSH recall vs brute force,
dedup family consistency."""

from __future__ import annotations

import pytest

from flink_cep_examples_spark.queries import QUERIES, ORACLES, load_all

from tests.oracle_harness import compare

load_all()

EXT_QUERY_NAMES = sorted(n for n in ORACLES if not n.startswith("cep_"))

#: ~2 min EACH (IVF training through the exact harness) — round-17
#: driver-budget deselection (VERDICT r16 item 1); still covered by the
#: round-close `pytest -m slow` run and tools/oracle_sweep.py.
_SLOW_EXT = {"ann_mmr_ivf_persisted_topk", "ann_mmr_ivf_topk"}
EXT_PARAMS = [
    pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_EXT else n
    for n in EXT_QUERY_NAMES
]


@pytest.mark.parametrize("name", EXT_PARAMS)
def test_extension_query_vs_oracle(spark, sf_small, name):
    ok, msg = compare(QUERIES[name](spark, sf_small), ORACLES[name], sf_small)
    assert ok, f"{name}: {msg}"


def test_minhash_lsh_vs_exact_jaccard(spark, sf_oracle):
    """LSH candidate recall: every exact-Jaccard near-dup pair (the
    correctness gate) must be surfaced by the banded MinHash path —
    with 8 bands x 4 rows and t=0.5, P(miss) = (1-s^4)^8 is ~2% at
    s=0.5 and <0.01% at s=0.8; the planted near-dups sit well above
    threshold, so on this corpus recall must be total."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_ngram_jaccard"](spark, sf_oracle).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_minhash_lsh"](spark, sf_oracle).collect()
    }
    assert exact, "expected planted near-dup pairs in the corpus"
    assert exact <= lsh, f"LSH missed pairs: {sorted(exact - lsh)[:5]}"


def test_exact_dedup_canonical_is_group_min(spark, sf_oracle):
    rows = QUERIES["dedup_exact"](spark, sf_oracle).collect()
    assert all(r.canonical_id <= r.doc_id for r in rows)


def test_ann_lsh_results_subset_of_bruteforce_space(spark, sf_oracle):
    """The multi-probe LSH search returns vectors whose exact cosine
    equals the brute-force computation for the same ids (same scoring,
    pruned candidate set), and its measured top-10 recall is at least
    the round-1 probe-1 design's (which was 0/10 on this corpus)."""
    brute = {
        r.vec_id: r.cos
        for r in QUERIES["ann_bruteforce_topk"](spark, sf_oracle).collect()
    }
    lsh = QUERIES["ann_lsh_topk"](spark, sf_oracle).collect()
    for r in lsh:
        if r.vec_id in brute:
            assert abs(r.cos - brute[r.vec_id]) < 1e-12
    # measured floor: radius-3 multi-probe on 16 planes recovers >=1 of
    # the true top-10 at sf0.01; the round-1 design recovered 0.
    assert len({r.vec_id for r in lsh} & set(brute)) >= 1


def test_probe_masks_are_exactly_the_hamming_ball():
    """The Spark side's mask-explode union and the oracle's declarative
    bit_count(xor(a,b)) <= R describe the same candidate set: the mask
    list enumerates the Hamming ball exactly once."""
    from math import comb

    from flink_cep_examples_spark.queries.similarity import (
        N_PLANES,
        PROBE_MASKS,
        PROBE_RADIUS,
    )

    assert len(set(PROBE_MASKS)) == len(PROBE_MASKS)
    assert len(PROBE_MASKS) == sum(
        comb(N_PLANES, k) for k in range(PROBE_RADIUS + 1)
    )
    assert all(0 <= m < 2**N_PLANES for m in PROBE_MASKS)
    assert all(bin(m).count("1") <= PROBE_RADIUS for m in PROBE_MASKS)


def test_ivf_recall_vs_bruteforce(spark, sf_oracle):
    """IVF with NPROBE=2 of K_LISTS=8 (25% of lists scanned) must keep
    most of the exact top-10 — measured 9/10 on this corpus; the floor
    leaves margin for constant tweaks, not for regressions to chance."""
    ivf = {r.vec_id for r in QUERIES["ivf_topk"](spark, sf_oracle).collect()}
    bf = {
        r.vec_id for r in QUERIES["ann_bruteforce_topk"](spark, sf_oracle).collect()
    }
    assert len(ivf & bf) >= 7


def test_cosine_dup_blocking_recall_floor(spark, sf_oracle):
    """Pair-candidate recall of the Hamming-<=R blocking vs the exact
    all-pairs answer. The corpus is weakly clustered (above-threshold
    pairs sit at cos 0.4-0.5, barely above background), so total recall
    is impossible for any sub-quadratic blocking; the floor asserts the
    measured improvement over round 1 (2/59 pairs) holds: >= 9/59."""
    import numpy as np

    from flink_cep_examples_spark.queries.similarity import DUP_COS_T
    from flink_cep_examples_spark.sources.tables import load_table

    emb = load_table(spark, sf_oracle, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    ids = np.array([r.vec_id for r in emb])
    M = np.array([r.embedding for r in emb], dtype=float)
    n = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = n @ n.T
    iu = np.triu_indices(len(M), 1)
    true_pairs = {
        (min(ids[i], ids[j]), max(ids[i], ids[j]))
        for i, j in zip(*iu)
        if S[i, j] >= DUP_COS_T
    }
    found = {
        (r.vec_a, r.vec_b)
        for r in QUERIES["embedding_cosine_dups"](spark, sf_oracle).collect()
    }
    assert found <= true_pairs, "blocking must never invent pairs"
    recall = len(found & true_pairs) / max(1, len(true_pairs))
    assert recall >= 2 / 59, f"recall regressed below round 1: {recall:.3f}"
    assert recall >= 0.12, f"recall below measured design floor: {recall:.3f}"


def test_novelty_check_consistent_with_lsh_pairs(spark, sf_small):
    """docs_novelty_check (round 13): the flagged arriving docs are
    EXACTLY the arriving-slice docs that appear in an LSH candidate
    pair with a corpus-slice doc (shared ≥1 band — the same keys
    dedup_minhash_lsh buckets on), and each owner really is a corpus
    doc from one of its pairs."""
    from flink_cep_examples_spark.queries.dedup import (
        _NMIX,
        _NMOD,
        NOVELTY_MOD,
        NOVELTY_RESIDUE,
    )

    def arriving(doc_id):
        return (doc_id * _NMIX) % _NMOD % NOVELTY_MOD == NOVELTY_RESIDUE

    flagged = {
        r.doc_id: r.owner_id
        for r in QUERIES["docs_novelty_check"](spark, sf_small).collect()
    }
    pairs = [
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_minhash_lsh"](spark, sf_small).collect()
    ]
    expected = set()
    for a, b in pairs:
        if arriving(a) != arriving(b):
            expected.add(a if arriving(a) else b)
    assert set(flagged) == expected
    for d, owner in flagged.items():
        assert not arriving(owner)
        assert any(
            {a, b} == {d, owner} or owner in (a, b)
            for a, b in pairs
            if d in (a, b)
        )
