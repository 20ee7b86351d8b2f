"""geomesa_cassandra_tools_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of
``dtsap/geomesa_cassandra_tools`` (reference surveyed in SURVEY.md) as a
distributed Spark DataFrame engine:

- Layer A (reference surface): catalog scans/predicates/distinct/anti-join
  existence checks/bool_and health aggregation/union flatten/regex text->struct
  parsing — see ``catalog.py`` and ``functions/parsing.py``.
- Layer B (engine surface): full relational operator set, as-of/range joins,
  geospatial z2 layout + bbox pruning, exact & approximate dedup, similarity
  search over embeddings, text analysis, streaming windows — see
  ``operators/`` and ``streaming/``.

Everything is built on public PySpark DataFrame/SQL APIs; plans stay inside
Catalyst/Tungsten (no row-at-a-time Python in the hot path).
"""

from geomesa_cassandra_tools_spark.session import get_spark
from geomesa_cassandra_tools_spark.sources.tables import TABLES, load_tables, register_views

__all__ = ["get_spark", "TABLES", "load_tables", "register_views"]

__version__ = "0.1.0"
