"""Vector-math column builders over array<float> embedding columns.

All JVM-side array HOFs (``transform``/``zip_with``/``aggregate``) — the
same machinery the reference uses in NumPy for the event-horizon distance
test (`scripts/metaheuristics.py:683-694`, R16), kept out of Python so the
hot path stays inside whole-stage codegen.

Determinism: elements are cast to double BEFORE any arithmetic; float32
intermediate math diverges from DuckDB's double path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    """Sequential-order dot product of two equal-length arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    """Cosine similarity of two double arrays (pre-cast with
    :func:`to_double_array`)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def euclidean(a, b) -> Column:
    """Euclidean distance (ref: np.linalg.norm(bh - star),
    metaheuristics.py:687)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
