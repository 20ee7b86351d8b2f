from geomesa_cassandra_tools_spark.operators import (
    dedup,
    geo,
    joins,
    maintenance,
    multimodal,
    relational,
    similarity,
)

__all__ = [
    "dedup",
    "geo",
    "joins",
    "maintenance",
    "multimodal",
    "relational",
    "similarity",
]
