from geomesa_cassandra_tools_spark.functions import parsing, text, vectors

__all__ = ["parsing", "text", "vectors"]
