from flink_cep_examples_spark.plans.pattern import (  # noqa: F401
    Measure,
    Pattern,
    PatternSpec,
    PatternVar,
    billing_pattern,
)
