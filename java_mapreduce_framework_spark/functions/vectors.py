"""Vector math over ``array<float>`` embedding columns.

All built-in higher-order functions (``zip_with`` + ``aggregate``):
the arithmetic stays JVM-side -- no Python round-trip -- and
accumulates left-to-right in double precision, which makes results
reproducible across engines (the DuckDB oracle's
``list_cosine_similarity`` accumulates the same way). Caveat: HOF
expressions are *interpreted*, not codegen'd, so hoist invariant
subexpressions (e.g. norms) out of join loops -- compute them once
per row side, not once per pair (see dedup.embedding_neardup_pairs).

At 100 TB the same expressions apply unchanged; for very hot paths a
Pandas-UDF batch (numpy dot over an Arrow batch) is the fallback, kept
in ``operators/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def vec_dot(a: Column, b: Column) -> Column:
    """Sum of elementwise products, double accumulator, in array order."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_as_double(a), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return vec_dot(a, b) / (l2_norm(a) * l2_norm(b))
