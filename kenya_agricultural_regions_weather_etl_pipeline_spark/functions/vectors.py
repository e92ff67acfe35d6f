"""Vector math over ``array<float>`` embedding columns — JVM-side.

``F.zip_with`` + ``F.aggregate`` keep dot products inside Catalyst
(no Python). Everything is computed in double after an explicit cast
so results match a DuckDB oracle computing on DOUBLE[].
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a sequential left-to-right fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays."""
    return dot(a, b) / (norm(a) * norm(b))


def cosine_pandas_udf():
    """Arrow-vectorized pandas_udf twin of :func:`cosine`.

    The JVM fold above is the default (no serialization hop); this twin
    is the scale alternative when the vector math grows past what an
    interpreted fold should do (e.g. very high dim × very high row
    count): numpy does the batch as one BLAS-ish pass per Arrow chunk.
    Equality with the native expression is pinned by a unit test (to
    float tolerance — numpy pairwise summation vs sequential fold).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a, b):
        av = np.stack(a.to_numpy())
        bv = np.stack(b.to_numpy())
        dots = np.einsum("ij,ij->i", av, bv)
        na = np.sqrt(np.einsum("ij,ij->i", av, av))
        nb = np.sqrt(np.einsum("ij,ij->i", bv, bv))
        return pd.Series(dots / (na * nb))

    return _cos


def cosine_sql(a: str, b: str) -> str:
    """DuckDB twin on DOUBLE[] arrays (list_dot_product = sequential sum)."""
    return (
        f"(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))"
    )


def quantize_int8(v: Column) -> tuple[Column, Column]:
    """Symmetric per-vector int8 quantization: (codes, scale).

    ``scale = max|vᵢ| / 127``; ``code = floor(vᵢ/scale + 0.5)`` (explicit
    half-up — the one rounding formula both engines compute identically
    on doubles). A zero vector quantizes to zeros with scale 0. This is
    the storage/ANN-compression step of an embedding pipeline: 4× smaller
    than float32, and the whole derivation is a narrow JVM expression —
    at 100 TB it fuses into the ingest scan with no shuffle.
    """
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = amax / F.lit(127.0)
    codes = F.when(amax == 0.0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int"))
    )
    return codes, scale


def quantize_int8_sql(v: str) -> tuple[str, str]:
    """DuckDB twin of :func:`quantize_int8` on a DOUBLE[] expression."""
    amax = f"list_max(list_transform({v}, x -> abs(x)))"
    scale = f"({amax} / 127.0)"
    codes = (
        f"CASE WHEN {amax} = 0.0 THEN list_transform({v}, x -> 0) "
        f"ELSE list_transform({v}, x -> CAST(floor(x / {scale} + 0.5) AS INT)) END"
    )
    return codes, scale


def cosine_given_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """:func:`cosine` with the norms precomputed by the caller.

    Higher-order array folds are interpreted (not codegen'd), so in a
    pair-join each vector's norm should be computed ONCE before the join
    instead of once per pair — a 3× cut in fold work at identical float
    semantics (same sequential fold, same operation order, bit-identical
    result; only the evaluation site moves).
    """
    return dot(a, b) / (na * nb)
