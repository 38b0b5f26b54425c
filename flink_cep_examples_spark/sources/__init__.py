from flink_cep_examples_spark.sources.billing import (  # noqa: F401
    billing_from_rows,
    events_as_billing,
    read_billing_csv,
    read_billing_csv_stream,
    with_event_time,
)
from flink_cep_examples_spark.sources.tables import load_table, load_tables  # noqa: F401
