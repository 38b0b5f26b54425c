from flink_cep_examples_spark.streaming.cep_stream import (  # noqa: F401
    match_pattern_stream,
)
