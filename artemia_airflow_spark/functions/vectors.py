"""Vector column math over array<float> embeddings — pure Catalyst
expressions (no Python UDF in the hot path).

`F.zip_with` + `F.aggregate` stay JVM-side inside whole-stage codegen;
at 100 TB this is the difference between a scan-speed dot product and a
Python-serialization bottleneck.  Accumulation is a sequential
left-fold in DOUBLE, which makes the value deterministic for a fixed
element order (arrays have one).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product of two array<numeric> columns."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))

