"""Schemas — the reference's entire schema universe, as explicit StructTypes.

Fixed, compile-time schemas (the reference parses CSV positionally into
case classes with no inference — events/BillingEvent.scala:11-18); we
mirror that philosophy: explicit ``StructType`` everywhere, never
inference.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: ``BillingEvent(id, datetime, balanceBefore, balanceAfter)``
#: (reference events/BillingEvent.scala:3-8). ``datetime`` is carried as
#: a string in format ``yyyy-MM-dd HH:mm:ss`` and parsed at UTC.
BILLING_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("datetime", T.StringType(), False),
        T.StructField("balanceBefore", T.LongType(), False),
        T.StructField("balanceAfter", T.LongType(), False),
    ]
)

#: Java/Flink datetime pattern from BillingEvent.scala:7; identical
#: semantics in Spark's to_timestamp for this pattern.
BILLING_DATETIME_FORMAT = "yyyy-MM-dd HH:mm:ss"

#: ``AlertReactionEvent(id, alarmTriggerDatetime, topupDatetime)``
#: (reference events/AlertReactionEvent.scala:3-5). ``topupDatetime`` is
#: the empty string for timeout/absence alerts
#: (FlinkCEPAbsenceOfEventExample.scala:97-101).
ALERT_REACTION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("alarmTriggerDatetime", T.StringType(), False),
        T.StructField("topupDatetime", T.StringType(), False),
    ]
)

#: Engine output = AlertReaction + side-output emulation. Structured
#: Streaming has no side outputs (Flink OutputTag,
#: FlinkCEPAbsenceOfEventExample.scala:77,95-102), so match and timeout
#: rows share one schema with a ``tag`` column in {'match','timeout'};
#: downstream splits with a filter.
TAGGED_ALERT_SCHEMA = T.StructType(
    list(ALERT_REACTION_SCHEMA.fields)
    + [T.StructField("tag", T.StringType(), False)]
)

MATCH_TAG = "match"
TIMEOUT_TAG = "timeout"
