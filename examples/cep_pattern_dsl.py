"""Twin of FlinkCEPExample.scala (reference program 1): the Pattern DSL.

Builds PATTERN (A B* C) WITHIN 1 HOUR, AFTER MATCH SKIP PAST LAST ROW
with the reference predicates (FlinkCEPExample.scala:58-74) and prints
one AlertReactionEvent per match (id, alarmTriggerDatetime,
topupDatetime) — expected golden output:
``2,2020-05-01 11:00:00,2020-05-01 11:40:00``.
"""

import sys

from _common import input_df, session

from flink_cep_examples_spark.operators import match_pattern
from flink_cep_examples_spark.plans import billing_pattern


def main() -> None:
    spark = session()
    df = input_df(spark, sys.argv)
    out = match_pattern(df, billing_pattern()).drop("tag")
    out.show(truncate=False)


if __name__ == "__main__":
    main()
