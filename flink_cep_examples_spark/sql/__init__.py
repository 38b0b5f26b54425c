from flink_cep_examples_spark.sql.match_recognize import (  # noqa: F401
    match_recognize,
    parse_match_recognize,
    sql_with_match_recognize,
)
