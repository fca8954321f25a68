from es_analytics_spark.plans.inspect import (
    physical_plan,
    assert_pushed_filters,
    assert_broadcast_join,
    assert_no_cartesian,
)

__all__ = [
    "physical_plan",
    "assert_pushed_filters",
    "assert_broadcast_join",
    "assert_no_cartesian",
]
