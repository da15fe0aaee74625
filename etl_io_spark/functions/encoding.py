"""Space-filling-curve encodings for multi-column data clustering.

``morton2`` interleaves the low bits of two integer keys into one Z-order
value. Sorting/range-partitioning a table by that value co-locates rows
that are close in BOTH dimensions, so parquet min/max stats stay tight for
either column — point/range filters on x OR y skip most files, which a
single-column sort can only deliver for its leading key. This is the
standard lakehouse "Z-ORDER BY (a, b)" layout primitive (cf. Delta/Iceberg
clustering), built here from pure Catalyst bit arithmetic — whole-stage
codegen, no UDF, no shuffle beyond the layout write's own range exchange.

The bit-spreading uses the classic magic-number doubling chain; the same
chain is emitted as ANSI SQL (``morton2_sql``) so DuckDB oracles reproduce
the value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: (shift, mask) doubling chain that spreads a 16-bit value onto the even
#: bit positions of a 32-bit lane.
_SPREAD16 = ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555))


def _spread_bits(c: Column) -> Column:
    c = c.cast("bigint").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD16:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def morton2(x: Column, y: Column) -> Column:
    """Z-order (Morton) code of two integer columns: the low 16 bits of
    each are interleaved (x on even positions, y on odd) into one BIGINT.
    Keys wider than 16 bits contribute their low 16 — callers bucketize
    first (e.g. ``F.col('k') % 65536`` or an epoch-day) when the full
    range matters."""
    return _spread_bits(x).bitwiseOR(F.shiftleft(_spread_bits(y), 1))


def morton2_sql(x_expr: str, y_expr: str) -> str:
    """The same Z-order computation as one ANSI-SQL expression (DuckDB
    oracle parity: identical shifts/masks, BIGINT arithmetic)."""

    def spread(e: str) -> str:
        s = f"(CAST({e} AS BIGINT) & 65535)"
        for shift, mask in _SPREAD16:
            s = f"((({s}) | (({s}) << {shift})) & {mask})"
        return s

    return f"({spread(x_expr)} | ({spread(y_expr)} << 1))"
