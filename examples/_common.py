"""Shared plumbing for the example scripts: load the billing CSV given
on the command line, or the reference's embedded golden input."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_cep_examples_spark.session import get_spark  # noqa: E402
from flink_cep_examples_spark.sources import (  # noqa: E402
    billing_from_rows,
    read_billing_csv,
)


def input_df(spark, argv):
    if len(argv) > 1:
        return read_billing_csv(spark, argv[1])
    from tests.fixtures import GOLDEN_INPUT_ROWS

    return billing_from_rows(spark, GOLDEN_INPUT_ROWS)


def session():
    return get_spark(app_name="cep-example", master="local[4]", shuffle_partitions=4)
