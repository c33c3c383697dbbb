"""Vector math over array<float> embedding columns.

Built-in higher-order functions (zip_with/aggregate) — JVM-side, no UDFs.
Sums are performed in double, sequentially, which both Spark and DuckDB do
identically → bit-stable cross-engine results for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_milli(a: Column, b: Column) -> Column:
    """Cosine similarity x1e6 floored to bigint — integer-stable for
    cross-engine comparison (float formatting differs between engines)."""
    return F.floor(cosine(a, b) * 1e6).cast("bigint")
