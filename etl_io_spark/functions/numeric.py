"""Numeric parity helpers shared by operators and their SQL oracles."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def round_pz(col: Column | str, scale: int) -> Column:
    """``F.round`` that normalizes IEEE negative zero to +0.0.

    A sign-indefinite quantity (z-score, slope, correlation, cosine, PMI)
    whose true value is ~0 can round to -0.0 or +0.0 depending on the
    sign of sub-ulp FP residue — which differs between engines because
    summation order differs. ``+ 0.0`` maps -0.0 → +0.0 (and preserves
    NULL), so both engines agree by construction; the paired SQL oracles
    append the same ``+ 0.0``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, scale) + F.lit(0.0)
