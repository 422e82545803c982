from aws_etl_spark.plans.inspect import (
    PlanFacts,
    assert_broadcast_join,
    assert_filter_pushed,
    assert_max_shuffles,
    executed_shuffle_bytes,
    formatted_plan,
    plan_facts,
    read_columns,
    simple_plan,
)

__all__ = [
    "PlanFacts",
    "assert_broadcast_join",
    "assert_filter_pushed",
    "assert_max_shuffles",
    "executed_shuffle_bytes",
    "formatted_plan",
    "plan_facts",
    "read_columns",
    "simple_plan",
]
