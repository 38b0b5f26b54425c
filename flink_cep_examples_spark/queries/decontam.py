"""Benchmark decontamination — flag training documents that contain any
n-gram from a held-out evaluation set (the standard pre-training
"contamination" sweep: an eval question leaking into the corpus inflates
downstream scores, so contaminated docs are dropped or masked).

Method (the public n-gram-overlap recipe): normalize text the same way
the dedup family does (lowercase, strip non-alphanumerics), hash every
contiguous N_GRAM-token window to a 31-bit integer with the repo's
portable md5-arith hash, and semi-join corpus windows against the eval
set's windows. A doc is contaminated iff it shares ≥ 1 window hash.

The eval set here is a deterministic pseudo-random corpus slice
(mix(doc_id) % EVAL_MOD == EVAL_RESIDUE) so the query is
self-contained; a real pipeline passes its own eval table.

Scale shape (100 TB): corpus-side window hashing is the codegen
posexplode + lead-window pattern (one shuffle on doc_id, int64 rows
only — text never leaves the scan stage); the eval side is tiny and
BROADCAST, so the containment join never shuffles the corpus; the
per-doc hit count is a map-side-combinable count-distinct. At larger
eval sets, swap the broadcast for a bloom filter on the window hash —
same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_cep_examples_spark.queries import register
from flink_cep_examples_spark.queries.dedup import (
    P,
    _h31,
    _sql_h31,
    _tokens,
)
from flink_cep_examples_spark.sources.tables import load_table, spread

#: contamination n-gram width (tokens); 8 is the common public choice
N_GRAM = 8

#: rolling-hash combiner base (shares the dedup convention family)
C = 1_000_003

#: eval-set selector: mix(doc_id) % EVAL_MOD == EVAL_RESIDUE (~2%)
_MIX, _MOD = 2654435761, 1 << 32
EVAL_MOD, EVAL_RESIDUE = 50, 7

#: Horner weights C^(N_GRAM-1-k) mod P for window position k
_WEIGHTS = [pow(C, N_GRAM - 1 - k, P) for k in range(N_GRAM)]


def _window_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, wh) — hash of every contiguous N_GRAM-token window:
    sum_k h(tok_{i+k}) * C^(N_GRAM-1-k) mod P over per-token 31-bit
    hashes. Windows shorter than N_GRAM (doc tail) are excluded, like
    the standard recipe. All arithmetic stays < 2^63."""
    e = docs.select(
        "doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos", "t")
    ).select("doc_id", "pos", _h31(F.col("t")).alias("h"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    acc = None
    for k, wt in enumerate(_WEIGHTS):
        term = (F.lead("h", k).over(w) % P) * F.lit(wt) % P
        acc = term if acc is None else (acc + term) % P
    has_full = F.lead("h", N_GRAM - 1).over(w).isNotNull()
    return e.select(
        "doc_id", acc.alias("wh"), has_full.alias("full")
    ).filter("full").select("doc_id", "wh")


def docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contaminated training docs: corpus documents (outside the eval
    slice) sharing at least one N_GRAM-token window hash with the eval
    slice. Emits (doc_id, n_hits = distinct shared window hashes),
    contaminated rows only."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    is_eval = (F.col("doc_id") * _MIX) % _MOD % EVAL_MOD == EVAL_RESIDUE
    eval_hashes = (
        _window_hashes(docs.filter(is_eval)).select("wh").distinct()
    )
    corpus = _window_hashes(docs.filter(~is_eval))
    return (
        corpus.join(F.broadcast(eval_hashes), "wh")
        .groupBy("doc_id")
        .agg(F.countDistinct("wh").alias("n_hits"))
    )


def _sql_window_hashes(src: str, out: str) -> str:
    terms = " + ".join(
        f"(th[i+{k}] * {wt}) % {P}" for k, wt in enumerate(_WEIGHTS)
    )
    return f"""{out} AS (
  SELECT doc_id,
         unnest([({terms}) % {P}
                 FOR i IN range(1, len(th) - {N_GRAM - 2})]) AS wh
  FROM (
    SELECT doc_id,
           [{_sql_h31('t')} FOR t IN
              regexp_split_to_array(
                trim(regexp_replace(regexp_replace(lower(text),
                     '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' ')] AS th
    FROM {src})
)"""


ORACLE_DECONTAM = f"""
WITH eval_docs AS (
  SELECT * FROM documents
  WHERE (doc_id * {_MIX}) % {_MOD} % {EVAL_MOD} = {EVAL_RESIDUE}
),
corpus_docs AS (
  SELECT * FROM documents
  WHERE (doc_id * {_MIX}) % {_MOD} % {EVAL_MOD} != {EVAL_RESIDUE}
),
{_sql_window_hashes('eval_docs', 'ew')},
{_sql_window_hashes('corpus_docs', 'cw')}
SELECT cw.doc_id, COUNT(DISTINCT cw.wh) AS n_hits
FROM cw JOIN (SELECT DISTINCT wh FROM ew) e USING (wh)
GROUP BY cw.doc_id
"""


register("docs_decontaminate", docs_decontaminate, ORACLE_DECONTAM, driver=False)


def docs_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every UNORDERED source
    pair, how many distinct N_GRAM-token window hashes they share —
    the corpus-analysis sweep that finds mirrored/scraped content
    across ingestion sources before training.

    Scale shape: windows reduce to DISTINCT (source, wh) pairs first
    (map-side combinable; text never leaves the scan stage), then the
    self-join runs on the 31-bit hash — the join key is an int, its
    fan-out bounded by the number of SOURCES sharing a window (≤
    #sources, a small constant), never by document count."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    sw = (
        _window_hashes(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", "wh")
        .distinct()
    )
    a, b = sw.alias("a"), sw.alias("b")
    return (
        a.join(
            b,
            (F.col("a.wh") == F.col("b.wh"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_windows"))
    )


ORACLE_SOURCE_OVERLAP = f"""
WITH {_sql_window_hashes('documents', 'w')},
sw AS (
  SELECT DISTINCT d.source, w.wh
  FROM w JOIN documents d USING (doc_id)
)
SELECT a.source AS source_a, b.source AS source_b,
       COUNT(*) AS shared_windows
FROM sw a JOIN sw b ON a.wh = b.wh AND a.source < b.source
GROUP BY 1, 2
"""


register(
    "docs_source_overlap", docs_source_overlap, ORACLE_SOURCE_OVERLAP,
    driver=False,  # r13 rotation: 8 green rounds (r5-r12); pytest-gated now
)


# ---------------------------------------------------------------------------
# Round 6: BLOOM-FILTER decontamination — the plan shape the exact
# semi-join's docstring promises at larger eval sets: compress the
# eval window-hash set into a fixed-size bit array and test corpus
# windows against it; false positives are possible (bounded by the
# filter geometry), false negatives are not.
# ---------------------------------------------------------------------------

#: filter geometry: M bits as 32-bit words (off < 32 keeps every
#: shifted bit positive int64 in BOTH engines), K probes with
#: INDEPENDENT multipliers — additive salts under one multiplier give
#: probe bits that differ by a wh-independent constant (k hashes
#: collapse to 1, measured 65 FP docs vs 2 exact at sf0.01);
#: distinct odd multipliers are genuinely different permutations
#: (2 bloom-only docs at sf0.01 after the fix). The pytest pins
#: bloom ⊇ exact (no false negatives), not an FP ceiling.
_BLOOM_BITS_LOG2 = 17
_BLOOM_BITS = 1 << _BLOOM_BITS_LOG2
_BLOOM_WORDS = _BLOOM_BITS // 32
#: Knuth / xxhash-prime / another odd 32-bit constant; wh < 2^31 so
#: every product stays < 2^63 in both engines
_BLOOM_MULTS = (2654435761, 2246822519, 3266489917)


def _bloom_bit_sql(col: str, mult: int, idiv: str) -> str:
    """Probe bit index: high BITS_LOG2 bits of ``col * mult mod 2^32``
    (identical arithmetic both engines)."""
    return (
        f"(({col} * {mult}) % {_MOD}) "
        f"{idiv} {1 << (32 - _BLOOM_BITS_LOG2)}"
    )


def docs_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter contamination sweep: corpus documents whose
    N_GRAM window hashes hit the eval slice's Bloom filter (all K
    probe bits set). Emits (doc_id, n_hits_bloom) — a SUPERSET of the
    exact semi-join's flags (no false negatives; the pytest pins the
    superset relation against docs_decontaminate).

    Scale design — the reason this variant exists: the exact recipe
    broadcasts the eval window-hash SET, which grows with the eval
    corpus; the filter is a FIXED 2^17-bit / 4096-word table whatever
    the eval size, so the corpus-side test stays one broadcast join
    against 4096 rows (or a literal array at deployment) and the
    corpus never shuffles. Build is a map-side-combined bit_or per
    word. All arithmetic is the module's portable integer discipline,
    so DuckDB reproduces the filter bit-for-bit."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    is_eval = (F.col("doc_id") * _MIX) % _MOD % EVAL_MOD == EVAL_RESIDUE
    eval_hashes = (
        _window_hashes(docs.filter(is_eval)).select("wh").distinct()
    )
    probes = F.explode(
        F.array(
            *[
                F.expr(_bloom_bit_sql("wh", s, "div"))
                for s in _BLOOM_MULTS
            ]
        )
    ).alias("bit")
    words = (
        eval_hashes.select(probes)
        .select(
            F.expr("bit div 32").alias("word"),
            F.expr("CAST(1 AS BIGINT) << CAST(bit % 32 AS INT)").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    corpus = _window_hashes(docs.filter(~is_eval)).withColumn(
        "probe", probes
    ).select(
        "doc_id",
        "wh",
        F.expr("probe div 32").alias("word"),
        F.expr("CAST(1 AS BIGINT) << CAST(probe % 32 AS INT)").alias(
            "mask"
        ),
    )
    hits = (
        corpus.join(F.broadcast(words), "word")
        .withColumn(
            "set_", (F.col("bits").bitwiseAND(F.col("mask")) != 0)
        )
        .groupBy("doc_id", "wh")
        .agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.sum(F.col("set_").cast("int")).alias("n_set"),
        )
        .filter(
            (F.col("n_probes") == len(_BLOOM_MULTS))
            & (F.col("n_set") == len(_BLOOM_MULTS))
        )
    )
    return hits.groupBy("doc_id").agg(
        F.countDistinct("wh").alias("n_hits_bloom")
    )


def _oracle_bloom() -> str:
    probe_rows = ", ".join(f"({m})" for m in _BLOOM_MULTS)
    bit_expr = (
        f"((wh * s.mult) % {_MOD}) "
        f"// {1 << (32 - _BLOOM_BITS_LOG2)}"
    )
    return f"""
WITH mults(mult) AS (VALUES {probe_rows}),
eval_docs AS (
  SELECT * FROM documents
  WHERE (doc_id * {_MIX}) % {_MOD} % {EVAL_MOD} = {EVAL_RESIDUE}
),
corpus_docs AS (
  SELECT * FROM documents
  WHERE (doc_id * {_MIX}) % {_MOD} % {EVAL_MOD} != {EVAL_RESIDUE}
),
{_sql_window_hashes('eval_docs', 'ew')},
{_sql_window_hashes('corpus_docs', 'cw')},
ebits AS (
  SELECT DISTINCT {bit_expr} AS bit
  FROM (SELECT DISTINCT wh FROM ew), mults s
),
words AS (
  SELECT bit // 32 AS word, bit_or(1::BIGINT << CAST(bit % 32 AS INT))
           AS bits
  FROM ebits GROUP BY 1
),
cprobe AS (
  SELECT cw.doc_id, cw.wh,
         {bit_expr} // 32 AS word,
         (1::BIGINT << CAST(({bit_expr}) % 32 AS INT)) AS mask
  FROM cw, mults s
),
whits AS (
  SELECT doc_id, wh
  FROM cprobe JOIN words USING (word)
  GROUP BY doc_id, wh
  HAVING COUNT(*) = {len(_BLOOM_MULTS)}
     AND SUM(CASE WHEN (bits & mask) != 0 THEN 1 ELSE 0 END)
           = {len(_BLOOM_MULTS)}
)
SELECT doc_id, COUNT(DISTINCT wh) AS n_hits_bloom
FROM whits GROUP BY doc_id
"""


register(
    "docs_decontaminate_bloom",
    docs_decontaminate_bloom,
    _oracle_bloom(),
    driver=False,  # r15 rotation: 8 green rounds (r7-r14), most-verified
    # tier — demoted for the round-14 registrations; pytest-oracled
)


def docs_decontam_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) contamination report (round 15) — the ops
    dashboard a decontamination run actually publishes: for every
    arriving (non-eval) source × language cell, how many docs arrived,
    how many are contaminated (≥1 shared eval window hash —
    :func:`docs_decontaminate`'s flag set), the total shared-hash
    count, and the contamination rate. A cell with an outlier rate
    localizes WHICH ingestion source is leaking eval data — the flag
    set alone can't say.

    Scale shape: reuses the decontaminate sweep (corpus windows join a
    broadcast eval hash set — text never shuffles) plus one broadcast
    join of the flag set back onto the (doc_id, source, lang) skeleton
    and a (source × lang)-cardinality aggregation. Nothing new
    shuffles wide."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    is_eval = (F.col("doc_id") * _MIX) % _MOD % EVAL_MOD == EVAL_RESIDUE
    arriving = docs.filter(~is_eval).select("doc_id", "source", "lang")
    flagged = docs_decontaminate(spark, sf_dir)
    joined = arriving.join(flagged, "doc_id", "left")
    return joined.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("n_hits").alias("n_contam"),
        F.coalesce(F.sum("n_hits"), F.lit(0)).alias("total_hits"),
        (
            F.count("n_hits").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("contam_rate"),
    )


ORACLE_DECONTAM_REPORT = f"""
WITH flags AS ({ORACLE_DECONTAM}),
arriving AS (
  SELECT doc_id, source, lang FROM documents
  WHERE (doc_id * {_MIX}) % {_MOD} % {EVAL_MOD} != {EVAL_RESIDUE}
)
SELECT a.source, a.lang,
       COUNT(*) AS n_docs,
       COUNT(f.n_hits) AS n_contam,
       CAST(COALESCE(SUM(f.n_hits), 0) AS BIGINT) AS total_hits,
       CAST(COUNT(f.n_hits) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS contam_rate
FROM arriving a LEFT JOIN flags f USING (doc_id)
GROUP BY a.source, a.lang
"""


register(
    "docs_decontam_report",
    docs_decontam_report,
    ORACLE_DECONTAM_REPORT,
    # r16 rotation: promoted (never-driver-verified r15 registration)
)
