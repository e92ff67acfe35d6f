"""Multi-dimensional data-layout keys (Z-order / Morton curves).

The 100 TB problem these solve: parquet min/max pruning (row-group
skipping, file skipping, Delta/Iceberg data-skipping stats) works per
FILE, so a table sorted by one column prunes only predicates on that
column. Interleaving the bits of two (or more) columns into one sort
key — the Z-order / Morton curve — makes files cover small RECTANGLES
of the combined key space, so min/max stats stay tight on EVERY
interleaved dimension and predicates on any of them skip data.

Both engines compute the key from ONE generator: :func:`zorder_key`
emits the Spark Column, :func:`zorder_key_sql` the DuckDB twin, built
from the same bit schedule — a retune cannot desynchronize the oracle.

All arithmetic is non-negative int64 bit ops (no floats anywhere), so
the key is exact and portable by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative
    integer columns: bit i of ``x`` lands at position 2i, bit i of
    ``y`` at 2i+1. Inputs are masked to ``bits`` first (values beyond
    the grid clamp into it; callers normalize/choose bits so the
    interesting range fits). Pure codegen'd int64 expressions — a
    static sum of ``2·bits`` masked shifts, no UDF, no float."""
    xm = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ym = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
        out = out + F.shiftleft(
            F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return out


def zorder_key_sql(x: str, y: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_key` — same bit schedule, same
    masking, emitted as one int64 expression string."""
    xm = f"(CAST({x} AS BIGINT) & {(1 << bits) - 1})"
    ym = f"(CAST({y} AS BIGINT) & {(1 << bits) - 1})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xm} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ym} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
