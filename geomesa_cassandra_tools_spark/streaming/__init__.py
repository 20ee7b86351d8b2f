from geomesa_cassandra_tools_spark.streaming import windows

__all__ = ["windows"]
