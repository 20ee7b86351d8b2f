"""Vector math over embedding columns — pure Column expressions
(`zip_with`/`aggregate`), JVM-side, no UDFs.

CONTRACT: ``dot``/``norm``/``cosine``/``euclidean`` expect
``array<double>`` inputs — cast float arrays ONCE at ingestion with
``as_double`` (every operator in this package does, via its `_prep`).
The helpers deliberately do NOT re-cast: higher-order functions evaluate
interpreted per element, and wrapping each call in another `transform`
layer measurably slows the scoring hot paths (+60% on brute-force top-k)
while a float32 fold would silently drift from the double-precision SQL
oracle. `aggregate` is a sequential left fold, so summation order is the
array order on every engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """NULL (not a crash) for zero-norm inputs: Spark 4's default ANSI mode
    raises DIVIDE_BY_ZERO on double division, so an unguarded zero vector
    would abort the whole job; NULL instead sorts last under any
    ``cos DESC`` ranking and drops out of threshold filters — the same
    "no defined cosine" semantics cosine_pairs_above enforces by
    pre-filter."""
    denom = norm(a) * norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def euclidean(a: Column, b: Column) -> Column:
    diff = F.zip_with(a, b, lambda x, y: x - y)
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x))
