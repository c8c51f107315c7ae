"""Vector math over array<float|double> columns — JVM-side higher-order
functions (``zip_with`` + ``aggregate``), no Python in the hot path.

Used by the similarity-search operators over the ``embeddings`` table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — zip_with + aggregate, computed in double precision with a
    deterministic left-to-right summation order."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # CASE-guarded so a zero vector yields NULL under ANSI mode too
    # (bare division would hard-fail the job there); consumers treat
    # NULL as "no similarity", same as the SQL oracles' behavior
    denom = norm(a) * norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def cosine_rounded(a: Column, b: Column, digits: int = 4) -> Column:
    """Cosine similarity rounded for cross-engine comparison (summation
    order differences across engines live far below 1e-4)."""
    return F.round(cosine(a, b), digits)
