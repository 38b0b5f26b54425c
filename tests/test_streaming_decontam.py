"""Ingest-time decontamination: the frozen-eval-set scorer must
reproduce the batch sweep exactly (shared normalization + token hash +
window combiner), streaming or batch, including a planted-leak case."""

from __future__ import annotations

from flink_cep_examples_spark.queries import QUERIES, load_all
from flink_cep_examples_spark.queries.decontam import (
    _MIX,
    _MOD,
    EVAL_MOD,
    EVAL_RESIDUE,
)
from flink_cep_examples_spark.streaming.decontam_stream import (
    decontaminate_stream,
    eval_window_hash_set,
)

load_all()


def test_decontam_stream_matches_batch_exactly(spark, sf_small, tmp_path):
    batch = {
        r.doc_id: r.n_hits
        for r in QUERIES["docs_decontaminate"](spark, sf_small).collect()
    }
    ev = eval_window_hash_set(spark, sf_small)
    assert ev
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").filter(
        f"(doc_id * {_MIX}) % {_MOD} % {EVAL_MOD} != {EVAL_RESIDUE}"
    )
    src = tmp_path / "src"
    docs.repartition(3).write.parquet(str(src))
    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    q = (
        decontaminate_stream(stream, ev)
        .writeStream.format("memory")
        .queryName("decontam_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM decontam_stream").collect()
    got = {r.doc_id: r.n_hits for r in rows}
    assert got == batch  # exact: same hashes, same distinct count
    assert len(rows) == len(got)


def test_decontam_stream_flags_planted_leak(spark, sf_small):
    """A doc containing a verbatim 8-token span from an eval doc is
    flagged; a doc of fresh tokens is not."""
    ev_doc = (
        spark.read.parquet(f"{sf_small}/documents.parquet")
        .filter(f"(doc_id * {_MIX}) % {_MOD} % {EVAL_MOD} = {EVAL_RESIDUE}")
        .first()
    )
    leak = " ".join(ev_doc.text.split()[:8])
    assert len(leak.split()) == 8
    ev = eval_window_hash_set(spark, sf_small)
    df = spark.createDataFrame(
        [
            (1, f"prefix words then {leak} and a tail", "en", "s", 0),
            (2, "completely fresh zq1 vk2 tokens xj3 here pq4 now", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.doc_id: r.n_hits for r in decontaminate_stream(df, ev).collect()}
    assert got.get(1, 0) >= 1
    assert 2 not in got
