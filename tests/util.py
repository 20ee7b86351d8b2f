"""Local differential harness mirroring the driver's correctness gate:
run the Spark query and its DuckDB oracle on the same parquet, compare
row-count + column set + order-insensitive canonical values."""

from __future__ import annotations

import math
from datetime import datetime

import duckdb
import pandas as pd

from geomesa_cassandra_tools_spark.sources.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{round(v, 9):.9g}"
    if isinstance(v, (pd.Timestamp, datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_value(v) for v in row))
    return sorted(out)


def assert_matches_oracle(spark, query_fn, oracle_sql: str, sf_dir: str, name: str = "?"):
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    oracle_pdf = con.execute(oracle_sql).fetchdf()
    con.close()

    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    # int-on-one-side / float-on-the-other skew (e.g. DuckDB HUGEINT sums
    # rendering as float64) would survive the lenient float canon below but
    # can flip a stricter stringified hash — fail it here.
    for c in oracle_pdf.columns:
        s_int = str(spark_pdf[c].dtype).startswith("int")
        o_int = str(oracle_pdf[c].dtype).startswith("int")
        s_float = str(spark_pdf[c].dtype).startswith("float")
        o_float = str(oracle_pdf[c].dtype).startswith("float")
        assert not (s_int and o_float) and not (s_float and o_int), (
            f"{name}.{c}: dtype skew spark={spark_pdf[c].dtype} "
            f"oracle={oracle_pdf[c].dtype} — cast the oracle side"
        )
    s_rows, o_rows = canon_rows(spark_pdf), canon_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
