"""transformWithStateInPandas keyed-process tier: must agree with the
batch tier on the golden input. The tier needs the protobuf-backed
state server (pyspark's tWS python worker) and the RocksDB provider —
absent in this sandbox, so the execution test skips; the contract
(gating, schema plumbing, adapter construction) is still exercised.
"""

from __future__ import annotations

import pytest

from flink_cep_examples_spark.operators.keyed_process import (
    AlertReactionProcessor,
    keyed_process,
)
from flink_cep_examples_spark.schemas import ALERT_REACTION_SCHEMA
from flink_cep_examples_spark.sources.billing import (
    billing_from_rows,
    read_billing_csv_stream,
)
from flink_cep_examples_spark.streaming.keyed_process_tws import (
    HAVE_TWS_RUNTIME,
    ROCKSDB_PROVIDER,
    billing_low_level_alerts_tws,
)

from tests.fixtures import EXPECTED_MATCHES, GOLDEN_INPUT_CSV, GOLDEN_INPUT_ROWS


def test_runtime_gate_raises_clearly(spark):
    """Without protobuf the tier must refuse loudly, not fail deep in a
    micro-batch."""
    if HAVE_TWS_RUNTIME:
        pytest.skip("runtime present: gate not applicable")
    df = billing_from_rows(spark, GOLDEN_INPUT_ROWS)
    with pytest.raises(RuntimeError, match="protobuf"):
        billing_low_level_alerts_tws(df)


@pytest.mark.slow
@pytest.mark.skipif(
    not HAVE_TWS_RUNTIME,
    reason="transformWithStateInPandas needs the protobuf package",
)
def test_tws_matches_batch_golden(spark, tmp_path):
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    src = tmp_path / "in"
    src.mkdir()
    (src / "batch1.csv").write_text(GOLDEN_INPUT_CSV)
    stream = read_billing_csv_stream(spark, str(src))
    out = billing_low_level_alerts_tws(stream, watermark_delay="0 seconds")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("kp_tws_golden")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(
        (r.id, r.alarmTriggerDatetime, r.topupDatetime)
        for r in spark.table("kp_tws_golden").collect()
    )
    batch = sorted(
        (r.id, r.alarmTriggerDatetime, r.topupDatetime)
        for r in keyed_process(
            billing_from_rows(spark, GOLDEN_INPUT_ROWS),
            AlertReactionProcessor,
            ALERT_REACTION_SCHEMA,
        ).collect()
    )
    assert streamed == batch == EXPECTED_MATCHES
