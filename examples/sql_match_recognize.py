"""Twin of FlinkSqlMatchRecognizeExample.scala (reference program 3):
the SQL MATCH_RECOGNIZE front-end, the reference query verbatim
(FlinkSqlMatchRecognizeExample.scala:50-68)."""

import sys

from _common import input_df, session

from flink_cep_examples_spark.sql import sql_with_match_recognize

QUERY = """
SELECT * FROM billing MATCH_RECOGNIZE (
  PARTITION BY id
  ORDER BY event_time
  MEASURES
    A.datetime AS alarmTriggerDatetime,
    C.datetime AS topupDatetime
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (A B* C) WITHIN INTERVAL '1' HOUR
  DEFINE
    A AS A.balanceBefore >= 10 AND A.balanceAfter < 10,
    B AS B.balanceBefore >= B.balanceAfter,
    C AS C.balanceBefore < C.balanceAfter
) t
"""


def main() -> None:
    spark = session()
    df = input_df(spark, sys.argv)
    sql_with_match_recognize(spark, QUERY, {"billing": df}).show(truncate=False)


if __name__ == "__main__":
    main()
