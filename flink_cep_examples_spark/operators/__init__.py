from flink_cep_examples_spark.operators.cep_batch import (  # noqa: F401
    match_pattern,
    match_pattern_alternation,
)
from flink_cep_examples_spark.operators.fast_path import (  # noqa: F401
    match_pattern_fast_abc,
)
