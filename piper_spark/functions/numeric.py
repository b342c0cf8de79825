"""Cross-engine-deterministic numeric recipes.

Spark and DuckDB sum doubles in different orders, so a naive
``sum(double)`` will not hash-match (SURVEY.md §7 "Float hash-matching").
The recipe here makes aggregate values bit-identical on both engines
AND stays inside whole-stage codegen:

1. scale each row to an integer: ``floor(x * 10^s + 0.5) AS LONG``.
   The inputs are exact s-decimal values (money columns are 2-decimal;
   their pairwise products 4- / triple products 6-decimal), so the
   scaled true value is integral — x*10^s lands within float-epsilon of
   an integer, and +0.5/floor snaps to it identically in both engines.
   floor stays pure double math: Spark's round() would allocate a
   BigDecimal per row (~2.5× slower), and a bare CAST(double AS BIGINT)
   truncates in Spark but rounds in DuckDB.
2. ``sum(long)`` — associative, exact, and ~4× faster than Spark's
   overflow-checked decimal aggregation buffer.
3. divide once by 10^s as double — a correctly-rounded IEEE op on
   identical operands in both engines.

Pick ``scale`` ≥ the true decimal precision of the expression.

Overflow bound: |sum| < 2^63 / 10^scale — at scale 6 that is ~9.2e12,
plenty for per-group sums even at large SF; for whole-100-TB global
sums use scale 2 columns or plain double sums (no oracle involved).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent sum of an (exact s-decimal) double column, as DOUBLE."""
    m = F.lit(float(10**scale))
    scaled = F.floor(col * m + F.lit(0.5)).cast("long")
    return F.sum(scaled).cast("double") / m


def davg(col: Column, scale: int = 2) -> Column:
    """Order-independent average of a double column, as DOUBLE."""
    return dsum(col, scale) / F.count(F.lit(1))


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB fragment mirroring :func:`dsum` exactly."""
    m = float(10**scale)
    return (
        f"(CAST(sum(CAST(floor(({expr}) * {m!r} + 0.5) AS BIGINT)) AS DOUBLE) / {m!r})"
    )


def sql_davg(expr: str, scale: int = 2) -> str:
    """DuckDB fragment mirroring :func:`davg` exactly."""
    return f"({sql_dsum(expr, scale)} / count(*))"
