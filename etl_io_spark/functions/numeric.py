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


def round_floor(col: Column | str, scale: int) -> Column:
    """Floor-form half-up rounding in PURE double arithmetic:
    ``floor(x·10^k + 0.5) / 10^k``.

    For ratios of clean decimals (int/int, means of thousandth-grain
    values) the true value routinely TERMINATES at the rounding
    position, where decimal ROUND diverges across engines (Spark's
    BigDecimal HALF_UP vs DuckDB's binary rounding — see
    aggregate.robust_anomaly). Floor-form is identical IEEE ops on
    identical doubles, ties toward +inf everywhere; SQL oracles mirror
    it verbatim as ``FLOOR(x * 10^k + 0.5) / 10^k``. Use plain ROUND
    (with ``round_pz`` when sign-indefinite) for non-terminating
    irrational-ish outputs."""
    c = F.col(col) if isinstance(col, str) else col
    scale_f = float(10**scale)
    return F.floor(c * F.lit(scale_f) + F.lit(0.5)) / F.lit(scale_f)
