from flink_cep_examples_spark.plans.pattern import (  # noqa: F401
    AlternationSpec,
    Measure,
    Pattern,
    PatternSpec,
    PatternVar,
    alternation,
    billing_pattern,
)
