"""Skew mitigation: salted join.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting is the deterministic fallback when one join
key dominates so heavily that even split partitions overwhelm a task
(the classic hot-key problem at 100 TB).

Shape: the large/skewed side gets a deterministic salt in [0, n_salt)
derived from a high-cardinality column; the smaller side is replicated
n_salt times; the join key becomes (key, salt). Result set is IDENTICAL
to the unsalted join — which is exactly what the DuckDB oracle checks —
but the shuffle spreads each hot key over n_salt reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    large_key: Column,
    small_key: Column,
    salt_source: Column,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``large ⋈ small`` on equal keys with an ``n_salt``-way salt.

    ``salt_source`` must be a deterministic high-cardinality expression
    on the large side (e.g. a line number or a hash of the row id) so
    rows of one hot key spread evenly. The small side is exploded
    ``n_salt``× — keep it the genuinely smaller relation.
    """
    salted_large = large.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_source), F.lit(n_salt)).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = salted_large.join(
        salted_small,
        (large_key == small_key) & (salted_large["__salt"] == salted_small["__salt"]),
        how,
    )
    return out.drop("__salt")
