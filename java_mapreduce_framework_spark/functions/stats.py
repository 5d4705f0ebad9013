"""Shared statistical column builders.

``entropy_bits`` is the ONE definition of the cross-engine-
deterministic Shannon-entropy fold used by ``user_behavior_entropy``
(operators/analytics.py), ``image_entropy`` (operators/multimodal.py)
and ``corpus_datasheet`` (operators/text.py): the identity
``H = log2(N) - (1/N) * sum c*log2(c)`` folded over an array of
(key, count) structs SORTED by key with a 0.0 seed. The sorted fold
pins double addition order, and IEEE ``0 + x == x`` makes the seeded
fold bit-equal to DuckDB's seedless ``list_reduce`` — so every caller
inherits the same oracle contract. Changing the fold here changes all
three operators AND requires the same change in each one's oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def entropy_bits(cells: Column, n: Column, count_field: str = "c") -> Column:
    """Shannon entropy (bits) of the count distribution carried in
    ``cells`` — an ``array<struct<..., count_field>>`` that MUST
    already be sorted (``F.array_sort`` on the key-first struct) so
    the fold order is deterministic. ``n`` is the exact total count."""
    s = F.aggregate(
        cells,
        F.lit(0.0),
        lambda acc, x: acc + x[count_field] * F.log2(x[count_field]),
    )
    return F.log2(n) - s / n
