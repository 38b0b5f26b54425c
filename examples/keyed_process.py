"""Twin of FlinkProcessFunctionExample.scala (reference program 4): the
hand-rolled keyed state machine on the low-level stateful tier
(named value states; the reference's observable inline-expiry
semantics, FlinkProcessFunctionExample.scala:44-87)."""

import sys

from _common import input_df, session

from flink_cep_examples_spark.operators.keyed_process import billing_low_level_alerts


def main() -> None:
    spark = session()
    df = input_df(spark, sys.argv)
    billing_low_level_alerts(df).show(truncate=False)


if __name__ == "__main__":
    main()
