"""Text→struct ingestion of nodetool/cqlsh-shaped output.

The reference's universal parse path is: splitlines → regex with named
groups → dict (compactions: /root/reference/node.py:110-114 and
geomesa_cassandra.py:120-124; snapshots: node.py:152-154 and
geomesa_cassandra.py:162-164; health probe: node.py:48-55; cqlsh data rows:
geomesa.py:41-42). Lines that don't match are silently dropped.

Here the same semantics are schema-on-read: one DataFrame row per text line
(`spark.read.text` or an exploded stdout column), `regexp_extract` per named
group — all JVM-side, whole-stage-codegen'd, no Python in the loop. A line
that doesn't match yields empty-string groups and is filtered out, which
reproduces the reference's silent-drop behavior explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: nodetool compactionstats row — the named-group shape of
#: /root/reference/node.py:111 (id, type, keyspace, table, ...). The id
#: group accepts any hex-ish identifier of ≥8 chars, either case (the
#: reference's strict-lowercase-UUID assumption drops uppercase and
#: legacy ids; its own broader [0-9a-zA-Z-_]+ would instead swallow the
#: column-header line as a data row — ≥8 hex-ish chars threads both).
COMPACTION_PATTERN = (
    r"^\s*(?P<id>[0-9a-fA-F-]{8,})\s+(?P<type>\w+)\s+(?P<keyspace>\S+)\s+(?P<table>\S+)"
)
_COMPACTION_GROUPS = ("id", "type", "keyspace", "table")

#: nodetool listsnapshots row — mirrors /root/reference/node.py:153
#: (name, keyspace, table, ...).
SNAPSHOT_PATTERN = r"^\s*(?P<name>\S+)\s+(?P<keyspace>\S+)\s+(?P<table>\S+)"
_SNAPSHOT_GROUPS = ("name", "keyspace", "table")

#: node-health probe — ALL THREE flags true (Gossip, Thrift, Native
#: Transport), /root/reference/node.py:48-53; a node with Thrift down is
#: NOT up.
UP_PATTERN = (
    r"Gossip[\s\S]*?true[\s\S]*?Thrift[\s\S]*?true[\s\S]*?Transport[\s\S]*?true"
)


def _extract(lines: DataFrame, line_col: str, pattern: str, groups: tuple[str, ...]) -> DataFrame:
    plain = pattern
    for g in groups:
        plain = plain.replace(f"(?P<{g}>", "(")
    out = lines
    for i, g in enumerate(groups, start=1):
        out = out.withColumn(g, F.regexp_extract(F.col(line_col), plain, i))
    # non-matching lines → all groups empty → dropped (reference behavior:
    # regex match is the row-existence test).
    return out.where(F.col(groups[0]) != "").drop(line_col)


def parse_compactions(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """`nodetool compactionstats` text rows → (id, type, keyspace, table).

    Add a ``node`` column before calling (the scatter-gather provenance the
    reference attaches with zip(); SURVEY.md §2.1 joins table)."""
    return _extract(lines, line_col, COMPACTION_PATTERN, _COMPACTION_GROUPS)


def parse_snapshots(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """`nodetool listsnapshots` text rows → (name, keyspace, table)."""
    return _extract(lines, line_col, SNAPSHOT_PATTERN, _SNAPSHOT_GROUPS)


def is_up(info_col: Column) -> Column:
    """Boolean health predicate over a `nodetool info` blob."""
    return info_col.rlike(UP_PATTERN)


def cqlsh_data_rows(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Keep cqlsh result-data lines (4-space indentation predicate,
    /root/reference/geomesa.py:42) and trim them."""
    return (
        lines.where(F.col(line_col).startswith("    "))
        .select(F.trim(F.col(line_col)).alias("row"))
    )
