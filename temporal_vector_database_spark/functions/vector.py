"""Vector math as Spark higher-order array expressions.

These replace the reference's numpy kernels (``core/delta_computer.py:74``
L2 of diff, ``:208-214`` cosine/L2 validation; FAISS normalized inner
product ``storage/storage_engine.py:101,153-155``) with JVM-side,
whole-stage-codegen'd column expressions — no Python in the hot path.
All math in float64 for DuckDB-oracle bit parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Inner product — ordered left fold, deterministic summation order."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def sub(a: Column | str, b: Column | str) -> Column:
    """Elementwise ``a - b`` (delta-encode raw diff, delta_computer.py:63)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.zip_with(a, b, lambda x, y: x - y)


def l2_dist(a: Column | str, b: Column | str) -> Column:
    return l2_norm(sub(a, b))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either side has zero norm
    (reference guards via normalize-then-IP, storage_engine.py:101)."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def normalize(a: Column | str) -> Column:
    """L2-normalize (FAISS index prep, storage_engine.py:101,153-155)."""
    a = F.col(a) if isinstance(a, str) else a
    n = l2_norm(a)
    return F.when(n > 0, F.transform(a, lambda x: x / n)).otherwise(a)
