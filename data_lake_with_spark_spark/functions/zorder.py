"""Z-order (Morton) curve values for multi-dimensional data layout.

A single sort key clusters one dimension; a 100 TB table filtered on
TWO dimensions (e.g. user × time, lat × lon) leaves the second
dimension scattered across every file, so its zone maps prune
nothing. Interleaving the bits of both dimensions into one Morton
code and range-sorting by it keeps each parquet file tight in BOTH
dimensions — a 2-D box predicate then prunes most row groups from
min/max statistics alone. This is the layout trick behind
Delta/Iceberg ``ZORDER BY``, expressed here as a plain codegen'd
column expression plus the existing range-sorted write
(``sources.sinks.write_sorted``).

Everything is integer bit arithmetic (``shiftright``/``&``/
``shiftleft`` folded over a literal bit sequence), so the value is
whole-stage-codegen'd JVM-side and bit-for-bit reproducible by the
DuckDB oracle with the same shifts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave two non-negative ints (``bits`` bits each)
    into one bigint: bit ``i`` of ``x`` lands at position ``2i``, bit
    ``i`` of ``y`` at ``2i+1``. Callers clamp/bucket the raw
    dimensions into ``[0, 2**bits)`` first (quantization is part of
    the layout design: z-ordering needs bounded, comparable bit
    widths, not raw 64-bit domains)."""
    xs = x.cast("bigint")
    ys = y.cast("bigint")
    acc = F.lit(0).cast("bigint")
    for i in range(bits):
        acc = (
            acc
            + F.shiftleft(F.shiftright(xs, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(ys, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return acc


def with_zvalue(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    out_col: str = "z",
) -> DataFrame:
    """Attach the Morton code of two pre-bucketed int columns."""
    return df.withColumn(out_col, zvalue(F.col(x_col), F.col(y_col), bits))


def oracle_zvalue_sql(x: str, y: str, bits: int = 16) -> str:
    """The DuckDB twin of :func:`zvalue` — identical shift folding, so
    the oracle reproduces the Morton code exactly."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1)::BIGINT << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1)::BIGINT << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
