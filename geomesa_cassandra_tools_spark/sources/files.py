"""Generic file sources beyond parquet: text lines, CSV, JSON.

The reference's only non-parquet inputs are free text (nodetool/cqlsh stdout,
parsed at /root/reference/node.py:84,110-114) and JSON (the remotes registry,
/root/reference/remote.py:83-90). Here those become schema-on-read sources:
`read_text_lines` feeds functions/parsing.py's regexp extractors one row per
line; CSV/JSON get explicit schemas (never inference in production — a
schema drift should fail loudly, not re-type a column).

At 100 TB all of these split by file/block automatically; the knobs that
matter are `spark.sql.files.maxPartitionBytes` (set in session.py) and
explicit schemas to skip the inference scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """One row per line, column ``value`` — the ingestion shape every parser
    in functions/parsing.py consumes (splitlines-as-a-table)."""
    return spark.read.text(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | StructType,
    header: bool = True,
    permissive_column: str | None = None,
) -> DataFrame:
    """Schema-declared CSV read. With ``permissive_column`` set, malformed
    rows land whole in that column instead of failing the job — the engine's
    analog of the reference's silent regex drop, made explicit and queryable
    (PERMISSIVE + _corrupt_record, SURVEY.md §2.1 fault-tolerant gather).

    Spark refuses plans that reference ONLY the corrupt column (column
    pruning would skip the parse that fills it) — `.cache()` the frame
    before corrupt-rows-only audits, per Spark's documented contract."""
    if permissive_column is not None:
        # the corrupt column must EXIST in the schema or PERMISSIVE mode
        # silently nulls malformed rows and the raw line is lost — append
        # it here so callers get the documented behavior without knowing
        # that Spark contract detail
        # normalize DDL strings to a StructType so the corrupt-column check
        # compares parsed field NAMES (a substring test would false-positive
        # on columns that merely contain the corrupt-column name), and build
        # a NEW StructType rather than StructType.add() — add() mutates the
        # caller's schema object in place, corrupting later reuse of it
        parsed = (
            schema if isinstance(schema, StructType) else StructType.fromDDL(schema)
        )
        if permissive_column not in {f.name for f in parsed.fields}:
            schema = StructType(
                list(parsed.fields) + [StructField(permissive_column, StringType())]
            )
        else:
            schema = parsed
    reader = spark.read.schema(schema).option("header", str(header).lower())
    if permissive_column is not None:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", permissive_column
        )
    else:
        reader = reader.option("mode", "FAILFAST")
    return reader.csv(path)


def read_json_records(
    spark: SparkSession, path: str, schema: str | StructType, multiline: bool = False
) -> DataFrame:
    """Schema-declared JSON-lines (or one-document-per-file) read."""
    return (
        spark.read.schema(schema)
        .option("multiLine", str(multiline).lower())
        .json(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC read — the second columnar interchange format warehouses hand
    us besides parquet. Spark's native vectorized ORC reader supports the
    same predicate pushdown / column pruning / partition discovery as
    parquet, so downstream operators are format-agnostic; schema comes
    from the ORC footer (self-describing, unlike text formats)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC write (zlib default codec) — round-trip partner of `read_orc`."""
    df.write.mode(mode).orc(path)
