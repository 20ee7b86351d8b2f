"""GeoCatalog — the engine's metastore, re-expressing the reference's
GeoMesa-catalog semantics as DataFrame operations.

Reference surface reproduced here (SURVEY.md §2.1):

- ``list_sfts``            — /root/reference/geomesa.py:35-45
  (SELECT sft FROM ks.catalog; dedup via set())
- ``find_schema_tables``   — /root/reference/geomesa.py:47-54 and
  /root/reference/geomesa_cassandra.py:48-52 (SELECT value WHERE sft=…,
  lower/strip, prefix filter)
- ``tables_exist`` / ``missing_tables`` — /root/reference/geomesa.py:61-67,
  /root/reference/geomesa_cassandra.py:33-37,55-58 (per-table DESCRIBE
  fan-out + all() gate) → here a single left-anti join + bool aggregate.
- ``remove_sft``           — /root/reference/geomesa.py:56-59 (DELETE
  WHERE sft=…) → filter-and-overwrite (or Delta DELETE when available).

The catalog itself is a DataFrame ``(keyspace, catalog, sft, value)``; at
scale it is a small metadata table and always broadcast-joins.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CATALOG_SCHEMA = "keyspace string, catalog string, sft string, value string"


@dataclass
class GeoCatalog:
    """A queryable catalog of feature types (SFTs) and their physical tables."""

    df: DataFrame

    @classmethod
    def from_rows(cls, spark: SparkSession, rows: list[tuple]) -> "GeoCatalog":
        return cls(spark.createDataFrame(rows, CATALOG_SCHEMA))

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "GeoCatalog":
        return cls(spark.read.parquet(path))

    def _scoped(self, keyspace: str, catalog: str) -> DataFrame:
        # Equality predicates push down to the source scan, the engine analog
        # of interpolating them into CQL (/root/reference/geomesa.py:49).
        return self.df.where(
            (F.col("keyspace") == keyspace) & (F.col("catalog") == catalog)
        )

    def list_sfts(self, keyspace: str, catalog: str) -> DataFrame:
        """Distinct SFT names in one catalog (projection + distinct)."""
        return self._scoped(keyspace, catalog).select("sft").distinct()

    def find_schema_tables(self, keyspace: str, catalog: str, sft: str) -> DataFrame:
        """Physical index tables backing one SFT.

        The catalog ``value`` holds newline-separated physical table names;
        normalize (lower/trim) and keep only names carrying the catalog
        prefix — the GeoMesa convention the reference filters on
        (/root/reference/geomesa.py:51-52).
        """
        return (
            self._scoped(keyspace, catalog)
            .where(F.col("sft") == sft)
            # \r?\n: CRLF-terminated catalog values must not leave a
            # trailing \r on the name (the reference's .strip() removes
            # all whitespace; F.trim strips spaces only)
            .select(F.explode(F.split(F.col("value"), "\r?\n")).alias("table"))
            .select(F.lower(F.trim(F.col("table"))).alias("table"))
            .where(F.col("table").startswith(catalog.lower()))
            .distinct()
        )

    def missing_tables(
        self, keyspace: str, catalog: str, sft: str, existing: DataFrame
    ) -> DataFrame:
        """Schema tables with no physical counterpart — the reference's
        N-concurrent-DESCRIBE existence probe collapsed into ONE left-anti
        join (no per-table fan-out, no barrier). The ``existing`` side is
        normalized (lower/trim) to match `find_schema_tables`' output, so a
        case-preserved DESCRIBE listing never reports a present table as
        missing."""
        return self.find_schema_tables(keyspace, catalog, sft).join(
            existing.select(F.lower(F.trim(F.col("table"))).alias("table")),
            on="table",
            how="left_anti",
        )

    def tables_exist(
        self, keyspace: str, catalog: str, sft: str, existing: DataFrame
    ) -> bool:
        """all(tables exist) gate (/root/reference/geomesa_cassandra.py:35-37)."""
        return self.missing_tables(keyspace, catalog, sft, existing).isEmpty()

    def remove_sft(self, keyspace: str, catalog: str, sft: str) -> "GeoCatalog":
        """DELETE FROM catalog WHERE sft=… as an immutable filter; the
        caller persists (overwrite or Delta DELETE). NULL-safe equality:
        under plain ``==``, a row with a NULL key column makes the negated
        conjunction NULL and ``where`` would silently DELETE that
        unrelated row — SQL DELETE semantics keep it."""
        return GeoCatalog(
            self.df.where(
                ~(
                    F.col("keyspace").eqNullSafe(keyspace)
                    & F.col("catalog").eqNullSafe(catalog)
                    & F.col("sft").eqNullSafe(sft)
                )
            )
        )


def nodes_registry(spark: SparkSession, path: str) -> DataFrame:
    """Load a remotes.json-shaped node registry
    (/root/reference/remotes.json.example:1-14) as a broadcastable dim table
    ``(name, host, port, user)``.

    Parsed as ``map<string, struct>`` via ``from_json`` rather than
    schema-inferred columns + ``stack``: node names are data, not
    identifiers (a quote/backtick in a name would corrupt a generated
    stack() expression), and per-node key differences (one node with a
    password, one key-based) must not make the struct types collide —
    extra keys are ignored, missing ones come back NULL."""
    raw = spark.read.text(path, wholetext=True)
    # port parsed as STRING then cast: a registry hand-edited to "port": "22"
    # (quoted) must not silently become NULL the way an int-typed from_json
    # field would; the cast accepts both JSON numbers and numeric strings
    node_map = F.from_json(
        F.col("value"), "map<string, struct<host:string, port:string, user:string>>"
    )
    # a registry that parses to NULL (malformed JSON, or a top-level array)
    # is misconfiguration — fail loudly instead of yielding zero rows; the
    # file is one wholetext row, so this eager probe is a bounded metadata
    # read, not a data scan
    bad = raw.where(node_map.isNull() & F.col("value").isNotNull()).limit(1).count()
    if bad:
        raise ValueError(
            f"nodes registry at {path!r} is not a JSON object of "
            "name -> {host, port, user} records"
        )
    return raw.select(F.explode(node_map).alias("name", "node")).select(
        "name",
        F.col("node.host").alias("host"),
        F.col("node.port").cast("int").alias("port"),
        F.col("node.user").alias("user"),
    )
