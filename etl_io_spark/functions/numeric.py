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


def ppm_floor(num: str, den: str) -> Column:
    """Exact BIGINT ``floor(num * 1_000_000 / den)`` for nonnegative
    BIGINT column expressions, with NO float and NO 128-bit intermediate.

    The multiplier is staged as 1e6 = 1000·1000 across three int64
    floor-divisions — ``floor(n·1e6/d) = (n div d)·1e6 + ((n%d·1000) div
    d)·1000 + ((n%d·1000)%d·1000) div d`` — so the largest intermediate
    is ``den·1000``: overflow-safe while ``den ≤ ~9.2e15`` (the naive
    ``num*1e6 div den`` wraps past ~9.2e12, which real HITS scores
    exceed). SQL oracles can instead compute the same value with a
    HUGEINT/DECIMAL widening — both are the exact mathematical floor,
    so they agree bit-for-bit. Takes column NAMES or SQL expressions
    (builds a SQL expr); only PLAIN identifiers ([A-Za-z_][A-Za-z0-9_]*,
    including SQL keywords) are backtick-quoted — a name containing a
    space/dot/hyphen is passed through verbatim and must be pre-quoted
    by the caller (it is indistinguishable from an expression here;
    ADVICE r6). Both sides are explicitly CAST to BIGINT so 32-bit
    inputs can't overflow the staged ``·1000`` products (they'd
    otherwise stay INT through ``%``/``*``). Inputs must be nonnegative
    (the staged identity assumes floor == div)."""

    def _q(expr: str) -> str:
        # Quote bare identifiers; leave real expressions (anything with
        # an operator, paren, space or existing quoting) untouched.
        if not expr:
            raise ValueError("ppm_floor: empty column expression")
        if expr.replace("_", "").isalnum() and not expr[0].isdigit():
            return f"`{expr}`"
        return expr

    n = f"(CAST({_q(num)} AS BIGINT))"
    d = f"(CAST({_q(den)} AS BIGINT))"
    return F.expr(
        f"({n} div {d}) * CAST(1000000 AS BIGINT)"
        f" + ((({n} % {d}) * 1000) div {d}) * 1000"
        f" + (((({n} % {d}) * 1000) % {d}) * 1000) div {d}"
    )


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
