"""Numeric scalar surface: the reference uses only `/` and round(x, 2)
(document/glue_t2.md:31,47,62,78,92,107-109,124) -- unit-scaled revenue
(/1e6, /1e4) and count ratios."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def round_scaled(col: Column, divisor: float = 1.0, scale: int = 2) -> Column:
    """round(col / divisor, scale) -- Presto `round(sum(amount)/1000000, 2)`."""
    return F.round(col / F.lit(divisor), scale)


def safe_ratio(num: Column, den: Column, scale: int = 2) -> Column:
    """Ratio of two counts as double, NULL on zero denominator (Presto `/` on
    bigints is integer division; we standardize on double + round and pin that
    choice in the oracles)."""
    return F.round(num / F.nullif(den, F.lit(0)), scale)
