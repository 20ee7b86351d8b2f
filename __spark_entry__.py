"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``   — flagship query (pricing summary) on sf0.001.
- ``queries()``      — every implemented operator from SURVEY.md §2 as a
  (spark, sf_dir) -> DataFrame callable.
- ``oracle_sql()``   — the DuckDB-equivalent ANSI SQL per query.

Implementations live in ``geomesa_cassandra_tools_spark/`` (queries.py /
oracles.py); this file is just the contract surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geomesa_cassandra_tools_spark.oracles import ORACLES
from geomesa_cassandra_tools_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
