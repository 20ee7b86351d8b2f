from geomesa_cassandra_tools_spark.functions import (
    parsing,
    tablefuncs,
    text,
    vectors,
)

__all__ = ["parsing", "tablefuncs", "text", "vectors"]
