"""Twin of FlinkCEPAbsenceOfEventExample.scala (reference program 2):
the same pattern plus the timed-out-partial side output.

Matches print with tag='match'; partials that never saw the top-up
within 1 hour print with tag='timeout' and empty topupDatetime
(TimedOutPartialMatchHandler + OutputTag,
FlinkCEPAbsenceOfEventExample.scala:77-106 — side outputs become a
``tag`` column here). Expected golden output: the key-2 match plus
``1,2020-05-01 11:00:00,`` on the timeout side.
"""

import sys

from _common import input_df, session

from flink_cep_examples_spark.operators import match_pattern
from flink_cep_examples_spark.plans import billing_pattern


def main() -> None:
    spark = session()
    df = input_df(spark, sys.argv)
    out = match_pattern(df, billing_pattern(emit_timeouts=True))
    out.filter(out.tag == "match").show(truncate=False)
    # the side output (reference: result.getSideOutput(tag).print())
    out.filter(out.tag == "timeout").show(truncate=False)


if __name__ == "__main__":
    main()
