"""Vector math over ``array<float>`` embedding columns.

Everything here is built from JVM-side higher-order functions
(``zip_with`` / ``aggregate`` / ``transform``) — no Python UDFs in the
hot path, so whole-stage codegen applies and the work scales with
executors, not with the Python bridge.  All arithmetic is forced to
DOUBLE so results are reproducible against any oracle regardless of the
stored float width.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col) -> Column:
    """array<float> -> array<double> (stable accumulation)."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a) -> Column:
    return F.sqrt(F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a, b) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def l1_norm(a) -> Column:
    return F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + F.abs(x))
