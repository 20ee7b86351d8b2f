from geomesa_cassandra_tools_spark.plans.inspect import (
    explain_str,
    pushed_filters,
    assert_no_python_udf,
)

__all__ = ["explain_str", "pushed_filters", "assert_no_python_udf"]
