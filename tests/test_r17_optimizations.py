"""Round-17 optimization pins: plan shapes and exact-equivalence
arguments for the round's changes, so a later edit cannot silently
regress them.

- _brute_scores: lazy pruned query branch, qn2 fused into the one
  aggregation (no crossJoin/BNLJ, no eager driver action at
  construction time)
- _adc_local_frames: the array-fold decimal sums are bit-identical to
  the old Spark join+groupBy LUT aggregation
- connected_components: the driver fast path runs ONE bounded action
  over the checkpointed edges (limit+1 collect), not a stats job + a
  separate collect
- materialize(): persist mode returns identical rows; unrecognized
  knob values raise (same for SPARK_GRAFT_SPREAD)
- docs_bm25_topk: the array-arithmetic tf frame equals the old
  explode+filter+groupBy postings rows exactly
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_cep_examples_spark.queries import QUERIES, load_all

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from flink_cep_examples_spark.session import get_spark

    load_all()
    return get_spark(master="local[4]", shuffle_partitions=4)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_brute_scores_single_corpus_scan_no_bnlj(spark):
    """ann_bruteforce_topk: one corpus parquet scan + one pruned
    single-row query scan; the qn2 crossJoin (BroadcastNestedLoopJoin)
    is gone — qn2 rides the main aggregation."""
    df = QUERIES["ann_bruteforce_topk"](spark, SF)
    plan = _plan(df)
    assert plan.count("Scan parquet") == 2, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # the pruned query branch must push the vec_id filter to the scan
    assert "PushedFilters: [IsNotNull(vec_id), EqualTo(vec_id,0" in plan.replace(
        "vec_id#", "vec_id,"
    ) or "EqualTo(vec_id,0" in plan, plan


def test_brute_scores_construction_runs_no_job(spark):
    """Building the DataFrame must not launch Spark jobs (the r16 eager
    first() regression): construction is pure plan assembly."""
    QUERIES["ann_bruteforce_topk"](spark, SF)  # warm the file index
    sc = spark.sparkContext
    st = sc.statusTracker()
    sc.setJobGroup("r17-brute-construct", "construction probe")
    QUERIES["ann_bruteforce_topk"](spark, SF)
    jobs = st.getJobIdsForGroup("r17-brute-construct")
    assert len(jobs) == 0, f"construction launched jobs: {jobs}"


def test_adc_local_frames_match_spark_aggregation(spark):
    """The driver-side LUT (IEEE products + Spark array-fold decimal
    sums) is bit-identical to the old cb⋈q groupBy aggregation and the
    old qn2 aggregate, on the real codebook/query rows."""
    from flink_cep_examples_spark.queries.similarity import (
        PQ_K,
        PQ_S,
        QUERY_VEC_ID,
        _TERM_DEC,
        _adc_local_frames,
    )
    from flink_cep_examples_spark.sources.tables import load_table

    rows = sorted(
        load_table(spark, SF, "embeddings")
        .filter((F.col("vec_id") < PQ_K) | (F.col("vec_id") == QUERY_VEC_ID))
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: int(r.vec_id),
    )
    qvec = [
        float(x)
        for r in rows
        if int(r.vec_id) == QUERY_VEC_ID
        for x in r.embedding
    ]
    codebook = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in rows
        if int(r.vec_id) < PQ_K
    ]
    lut_new, qn2_new = _adc_local_frames(spark, codebook, qvec)

    # the old formulation, verbatim
    cb = spark.createDataFrame(
        [(cw, pos, x) for cw, emb in codebook for pos, x in enumerate(emb)],
        "cw int, pos int, cx double",
    )
    q = spark.createDataFrame(
        list(enumerate(qvec)), "pos int, qx double"
    )
    dec = lambda c: c.cast(_TERM_DEC)  # noqa: E731
    lut_old = (
        cb.join(F.broadcast(q), "pos")
        .withColumn("b", (F.col("pos") / PQ_S).cast("int"))
        .groupBy("b", "cw")
        .agg(
            F.sum(dec(F.col("cx") * F.col("qx"))).alias("qdot"),
            F.sum(dec(F.col("cx") * F.col("cx"))).alias("cn2"),
        )
    )
    qn2_old = q.agg(
        F.round(F.sum(dec(F.col("qx") * F.col("qx"))), 12)
        .cast("double")
        .alias("qn2")
    )

    new = {(r.b, r.cw): (r.qdot, r.cn2) for r in lut_new.collect()}
    old = {(r.b, r.cw): (r.qdot, r.cn2) for r in lut_old.collect()}
    assert set(new) == set(old)
    for k in old:
        # Decimal compare — exact, not approx
        assert new[k][0] == old[k][0], (k, new[k][0], old[k][0])
        assert new[k][1] == old[k][1], (k, new[k][1], old[k][1])
    assert qn2_new.first().qn2 == qn2_old.first().qn2


def test_pq_and_ivfadc_luts_are_local(spark):
    """ann_pq_topk / ann_ivfadc_topk: the LUT + qn2 broadcast inputs
    are LocalTableScans (no Spark aggregation jobs inside the builds);
    pq's final plan holds exactly ONE parquet scan (the corpus encode),
    ivfadc's none (its corpus is the checkpointed emb)."""
    pq = _plan(QUERIES["ann_pq_topk"](spark, SF))
    assert pq.count("Scan parquet") == 1, pq
    # cb + lut + qn2 local frames surface as ExistingRDD scans
    assert pq.count("Scan ExistingRDD") == 3, pq
    adc = _plan(QUERIES["ann_ivfadc_topk"](spark, SF))
    assert adc.count("Scan parquet") == 0, adc
    assert adc.count("Scan ExistingRDD") >= 3, adc


def test_connected_components_single_gating_action(spark):
    """The small-graph fast path runs exactly ONE job over the
    checkpointed edge list (the bounded limit+1 collect) — the old
    stats-then-collect shape ran two."""
    from flink_cep_examples_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a long, b long"
    )
    sc = spark.sparkContext
    st = sc.statusTracker()
    sc.setJobGroup("r17-cc-gate", "cc gating probe")
    out = {
        r.id: r.component for r in connected_components(edges).collect()
    }
    jobs = st.getJobIdsForGroup("r17-cc-gate")
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    # jobs: localCheckpoint materialization + limit-collect + the final
    # collect of the local result frame = 3; the old shape ran 4
    assert len(jobs) <= 3, f"expected <=3 jobs, got {len(jobs)}: {jobs}"


def test_materialize_knob(spark, monkeypatch):
    from flink_cep_examples_spark.sources.tables import materialize

    df = spark.range(100).withColumn("v", F.col("id") * 2)
    base = {(r.id, r.v) for r in materialize(df).collect()}
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "persist")
    got = materialize(df)
    assert {(r.id, r.v) for r in got.collect()} == base
    got.unpersist()
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "bogus")
    with pytest.raises(ValueError, match="SPARK_GRAFT_MATERIALIZE"):
        materialize(df)


def test_spread_rejects_unknown_values(spark, monkeypatch):
    from flink_cep_examples_spark.sources.tables import spread

    df = spark.range(10)
    monkeypatch.setenv("SPARK_GRAFT_SPREAD", "off")
    with pytest.raises(ValueError, match="SPARK_GRAFT_SPREAD"):
        spread(df)
    monkeypatch.setenv("SPARK_GRAFT_SPREAD", "never")
    assert spread(df) is df


def test_bm25_array_tf_equals_explode_groupby(spark):
    """The array-arithmetic per-doc tf (size − size(array_remove)) and
    the old explode→filter→groupBy postings produce IDENTICAL
    (doc_id, dl, term, tf) rows."""
    from flink_cep_examples_spark.queries.text import (
        BM25_QUERY,
        _tok_count,
    )
    from flink_cep_examples_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    new = (
        docs.select(
            "doc_id",
            _tok_count(F.col("text")).alias("dl"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("term"),
                            (
                                F.size(toks)
                                - F.size(F.array_remove(toks, t))
                            )
                            .cast("bigint")
                            .alias("tf"),
                        )
                        for t in BM25_QUERY
                    ]
                )
            ).alias("p"),
        )
        .select("doc_id", "dl", "p.term", "p.tf")
        .filter(F.col("tf") >= 1)
    )
    old = (
        docs.select(
            "doc_id",
            _tok_count(F.col("text")).alias("dl"),
            F.explode(F.split(F.trim("text"), r"\s+")).alias("term"),
        )
        .filter(F.col("term").isin(*BM25_QUERY))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    a = {tuple(r) for r in new.collect()}
    b = {tuple(r) for r in old.collect()}
    assert a == b
