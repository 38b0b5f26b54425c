"""Composite training-corpus cleaning pipeline — the end-to-end pass a
pre-training data pipeline runs over raw documents, composed from the
engine's own operators (each independently oracle-gated):

1. quality gate  — :func:`queries.text.text_quality_scores` ``keep``
   (length / punctuation / digit-ratio filters);
2. exact dedup   — :func:`queries.dedup.dedup_exact`: only the
   canonical (minimum) doc_id of each normalized-content hash group
   survives;
3. near dedup    — :func:`queries.dedup.dedup_minhash_lsh` candidate
   pairs at estimated Jaccard ≥ NEAR_DUP_T: the larger doc_id of each
   pair is dropped (union-by-min keeps one representative per cluster
   for pair-shaped clusters; the synthetic corpus' planted dups are
   pairs).

Scale shape (100 TB): step 1 is a scan+project; step 2 shuffles a
32-byte hash; step 3 is the banded-LSH shuffle; the final assembly is
two joins on a single int64-ish doc_id column. The near-dup loser set
is proportional to the corpus duplicate fraction (commonly 20-50% of
docs at pre-training scale), so it must NOT be force-broadcast: both
joins are left unhinted and AQE picks broadcast vs shuffle from the
runtime size — an anti-join shuffling one id column is cheap either
way. The oracle composes the same three steps' oracle SQL as CTEs, so
the gate checks the composition, not just the parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cep_examples_spark.queries import register
from flink_cep_examples_spark.queries.dedup import (
    ORACLE_EXACT,
    _oracle_minhash,
    dedup_minhash_lsh,
)
from flink_cep_examples_spark.queries.text import ORACLE_QUALITY

#: estimated-Jaccard threshold above which an LSH candidate pair is a
#: near-duplicate (0.5 = the classic MinHash dedup operating point)
NEAR_DUP_T = 0.5


def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surviving corpus after quality + exact-dup + near-dup filtering:
    (doc_id, n_tokens) of every kept document.

    Round-16 optimization (guide §1.2: don't scan twice for what one
    pass computes): stages 1+2 are FUSED into one corpus scan — the
    quality expressions (:func:`queries.text.quality_columns`, the
    exact exprs behind ``text_quality_scores``) and the exact-dup
    fingerprint ride the same projection, and the canonical-id check
    is a window over ``fp`` (the :func:`dedup_exact` rewrite), so the
    old quality⋈canonical doc_id equi-join (two full text scans + two
    exchanges + an SMJ) collapses to one scan + one window filter.
    Both stages are 1:1 per doc_id, so inner-join == conjunction of
    their filters — same rows, pinned by the unchanged composition
    oracle. Step 3 (the banded-LSH loser anti-join) is unchanged."""
    from pyspark.sql.window import Window

    from flink_cep_examples_spark.queries.dedup import _norm_text
    from flink_cep_examples_spark.queries.text import quality_columns
    from flink_cep_examples_spark.sources.tables import load_table, spread

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    cols = quality_columns(F.col("text"))
    base = docs.select(
        "doc_id",
        cols["n_tokens"].alias("n_tokens"),
        cols["keep"].alias("keep"),
        F.md5(_norm_text(F.col("text"))).alias("fp"),
    )
    survivors = (
        base.withColumn(
            "canonical_id",
            F.min("doc_id").over(Window.partitionBy("fp")),
        )
        .where(F.col("keep") & (F.col("doc_id") == F.col("canonical_id")))
        .select("doc_id", "n_tokens")
    )
    near_losers = (
        dedup_minhash_lsh(spark, sf_dir)
        .where(F.col("est_jaccard") >= NEAR_DUP_T)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return survivors.join(near_losers, "doc_id", "left_anti")


ORACLE_PIPELINE = f"""
WITH q AS ({ORACLE_QUALITY}),
e AS ({ORACLE_EXACT}),
nd AS ({_oracle_minhash()})
SELECT q.doc_id, q.n_tokens
FROM q
JOIN e ON e.doc_id = q.doc_id AND e.doc_id = e.canonical_id
WHERE q.keep
  AND q.doc_id NOT IN (
    SELECT doc_b FROM nd WHERE est_jaccard >= {NEAR_DUP_T}
  )
"""

register("corpus_clean_pipeline", corpus_clean_pipeline, ORACLE_PIPELINE, driver=False)


def corpus_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 13: the INGEST-TIME curation pipeline as one composed,
    oracle-gated query — the batch twin of the single streaming job in
    examples/ingest_curation_stream.py (each stage independently
    bit-agrees with its streamed form):

    1. decontamination — drop arriving (non-eval) docs sharing an
       8-token window hash with the frozen eval slice
       (:func:`queries.decontam.docs_decontaminate`);
    2. learned quality — keep docs the NB classifier predicts good
       (:func:`queries.curation.docs_nb_quality_classifier`);
    3. token budget   — fill per-language budgets (derived from the
       SURVIVING token mass, the mix the budget is actually cut
       against) with the minimal deterministic hash-order prefix
       (:func:`queries.sampling.token_budget_prefix`).

    Scale shape: stage 1's corpus side never shuffles on text (int64
    window hashes, broadcast eval side); stage 2 is one token
    reduction + a B+16-row broadcast model; stage 3's wide shuffle is
    O(selected boundary rows). The assembly joins ship one id column;
    AQE picks broadcast vs shuffle. The oracle chains all three
    stages' oracle SQL, so the gate checks the COMPOSITION."""
    from flink_cep_examples_spark.queries.curation import (
        docs_nb_quality_classifier,
    )
    from flink_cep_examples_spark.queries.decontam import (
        _MIX as _DMIX,
        _MOD as _DMOD,
        EVAL_MOD,
        EVAL_RESIDUE,
        docs_decontaminate,
    )
    from flink_cep_examples_spark.queries.sampling import (
        token_budget_prefix,
    )
    from flink_cep_examples_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    arriving = docs.filter(
        f"(doc_id * {_DMIX}) % {_DMOD} % {EVAL_MOD} != {EVAL_RESIDUE}"
    ).select("doc_id", "lang", "n_chars")
    contaminated = docs_decontaminate(spark, sf_dir).select("doc_id")
    good = (
        docs_nb_quality_classifier(spark, sf_dir)
        .where("pred_good")
        .select("doc_id")
    )
    survivors = arriving.join(contaminated, "doc_id", "left_anti").join(
        good, "doc_id"
    )
    # Materialize the stage boundary (narrow: 2 longs + lang per row).
    # Correctness at scale, not a cache: token_budget_prefix's
    # kept_whole ∪ kept_boundary branches would otherwise each carry
    # the whole survivors-join lineage, and at the 100×-replica probe
    # AQE's reused-exchange handling of that duplicated lineage
    # crashed the whole-stage-codegen SMJ zip ("Can't zip RDDs with
    # unequal numbers of partitions: List(32, 64)" — reproduced at
    # K=40, skew-join toggle refuted; SCALING.md r14 K=100 section).
    # A real ingest pipeline persists the survivor set between stages
    # anyway — this is that persist point, and it is DURABLE (VERDICT
    # r14 item 2): a parquet write + read-back, so the downstream
    # stage's lineage roots at a rereadable file scan. The r14 form
    # (`localCheckpoint()`) cut the lineage too, but its blocks are
    # executor-local and non-replicated — on a real cluster one lost
    # node mid-stage-3 failed the job unrecoverably; a parquet
    # boundary re-reads from shared storage instead.
    return token_budget_prefix(
        _materialize_stage(survivors, sf_dir, "ingest_survivors")
    )


#: stage roots already registered for exit cleanup by THIS process
_STAGE_ROOTS_REGISTERED: set[str] = set()


def _materialize_stage(df: DataFrame, sf_dir: str, stage: str) -> DataFrame:
    """Durable stage boundary: write ``df`` to parquet and read it
    back, so the returned frame's lineage starts at a file scan —
    recomputable after executor loss, unlike ``localCheckpoint``'s
    executor-local blocks.

    Location: ``$SPARK_GRAFT_STAGE_DIR`` when set — on a real cluster
    this MUST be shared storage (HDFS/S3); the default local tempdir
    is the local-mode test stand-in only (executors and driver share
    one filesystem there). The root is keyed by (sf_dir, pid) so
    concurrent sessions on one host never collide (review r15).

    Round 16 (VERDICT r15 item 5 + ADVICE): each invocation writes an
    IMMUTABLE versioned subdirectory and publishes it via the shared
    ``index_manifest`` pointer commit — the same versioned-write +
    one-atomic-pointer pattern as the index lifecycle. The returned
    frame scans its own pinned version, so a frame held across a
    re-run keeps reading consistent data instead of racing an
    in-place overwrite; on shared storage a reader can never observe
    a half-overwritten boundary. ONE superseded version is retained
    per publish (the ``gc_versions`` grace window — a frame held
    across a single re-run stays scannable; round-16 review bounded
    what was previously retain-everything growth), and the whole
    pid-keyed root is removed at interpreter exit (the ADVICE
    /tmp-accumulation fix); a crashed process leaves only its own
    pid-keyed dir behind."""
    import atexit
    import hashlib
    import os
    import shutil
    import tempfile

    from flink_cep_examples_spark.index_manifest import (
        gc_versions,
        publish_manifest,
        read_manifest,
        tier_path,
    )

    base = os.environ.get("SPARK_GRAFT_STAGE_DIR") or tempfile.gettempdir()
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    root = f"{base}/spark_graft_stage_{stage}_{tag}_{os.getpid()}"
    version = read_manifest(root)["version"] + 1
    path = tier_path(root, "data", version)
    df.write.mode("overwrite").parquet(path)
    publish_manifest(root, version)
    gc_versions(root, ("data",), version)  # grace=1: previous retained
    if root not in _STAGE_ROOTS_REGISTERED:
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _STAGE_ROOTS_REGISTERED.add(root)
    return df.sparkSession.read.parquet(path)


def _oracle_ingest() -> str:
    from flink_cep_examples_spark.queries.curation import (
        NB_QUALITY_CTES,
        NB_QUALITY_SELECT,
    )
    from flink_cep_examples_spark.queries.decontam import (
        _MIX as _DMIX,
        _MOD as _DMOD,
        EVAL_MOD,
        EVAL_RESIDUE,
        ORACLE_DECONTAM,
    )
    from flink_cep_examples_spark.queries.sampling import (
        _TB_PCT,
        _TB_PCT_DEFAULT,
    )

    return f"""
WITH ct AS ({ORACLE_DECONTAM}),
{NB_QUALITY_CTES},
nb AS ({NB_QUALITY_SELECT}),
surv AS (
  SELECT d.doc_id, d.lang, (d.n_chars + 3) // 4 AS tok,
         (d.doc_id * {_DMIX}) % {_DMOD} AS h
  FROM documents d JOIN nb USING (doc_id)
  WHERE (d.doc_id * {_DMIX}) % {_DMOD} % {EVAL_MOD} != {EVAL_RESIDUE}
    AND nb.pred_good
    AND d.doc_id NOT IN (SELECT doc_id FROM ct)
),
bgt AS (
  SELECT lang,
         (SUM(tok) * CASE lang WHEN 'en' THEN {_TB_PCT["en"]}
                               WHEN 'zh' THEN {_TB_PCT["zh"]}
                               ELSE {_TB_PCT_DEFAULT} END) // 100 AS budget
  FROM surv GROUP BY lang
),
c AS (
  SELECT surv.doc_id, surv.lang, surv.tok, bgt.budget,
         COALESCE(SUM(surv.tok) OVER (
           PARTITION BY surv.lang ORDER BY surv.h, surv.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before
  FROM surv JOIN bgt USING (lang)
)
SELECT doc_id, lang, tok FROM c WHERE cum_before < budget
"""


register(
    "corpus_ingest_pipeline",
    corpus_ingest_pipeline,
    _oracle_ingest(),
    # r14 rotation: promoted into the driver gate (never-verified pool)
    driver=True,
)


def corpus_winnow_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 6 (stretch): winnowing-based dedup pipeline — the MOSS
    shape a real curation run uses, composed from three independently
    oracle-gated operators:

    1. fingerprints — :func:`queries.dedup.docs_winnowing` (SWA
       winnowing, density ~2/(W+1) of the shingle volume);
    2. overlap pairs — :func:`queries.dedup.docs_winnowing_overlap`
       (shared-fingerprint self-join, boilerplate df-capped);
    3. clusters — :func:`operators.graph.connected_components` over
       the pair graph (near-dup overlap is not transitive-closed), one
       canonical (minimum) doc_id kept per component.

    Output: every document with its cluster id, cluster size, and the
    keep decision (``kept`` = it is its cluster's canonical doc).

    Scale shape (100 TB): step 1 is one per-doc Exchange; step 2 joins
    the DISTINCT (doc_id, fp_hash) set on a 31-bit int hash (text
    never shuffles) with the df cap bounding per-hash fan-out; step 3
    is byte-gated driver union-find with a 1-shuffle/round label-
    propagation fallback; the final assembly is one left join on
    doc_id. Nothing here is all-pairs in the corpus."""
    from pyspark.sql.window import Window

    from flink_cep_examples_spark.operators.graph import connected_components
    from flink_cep_examples_spark.queries.dedup import docs_winnowing_overlap
    from flink_cep_examples_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = docs_winnowing_overlap(spark, sf_dir)
    comp = connected_components(pairs, src="doc_a", dst="doc_b").select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    allc = docs.join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
    )
    return allc.select(
        "doc_id",
        "cluster_id",
        F.count(F.lit(1))
        .over(Window.partitionBy("cluster_id"))
        .alias("n_members"),
        (F.col("doc_id") == F.col("cluster_id")).alias("kept"),
    )


def _oracle_winnow_dedup() -> str:
    from flink_cep_examples_spark.queries.dedup import ORACLE_WINNOW_OVERLAP

    return f"""
WITH RECURSIVE pairs AS ({ORACLE_WINNOW_OVERLAP}),
ud AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach(id, r) AS (
  SELECT DISTINCT a, a FROM ud
  UNION
  SELECT ud.b, reach.r FROM reach JOIN ud ON ud.a = reach.id
),
comp AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
allc AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c USING (doc_id)
)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS n_members,
       doc_id = cluster_id AS kept
FROM allc
"""


register(
    "corpus_winnow_dedup",
    corpus_winnow_dedup,
    _oracle_winnow_dedup(),
    driver=False,  # r15 rotation: 8 green rounds (r7-r14), most-verified
    # tier — demoted for the round-14 registrations; pytest-oracled
)
