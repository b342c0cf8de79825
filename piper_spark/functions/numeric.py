"""Cross-engine-deterministic numeric recipes.

Spark and DuckDB sum doubles in different orders, so a naive
``sum(double)`` will not hash-match. The recipes here make aggregate
values bit-identical on both engines (SURVEY.md §7 "Float hash-matching"):

- ``dsum``: round each row to a fixed scale (per-row double math is
  IEEE-identical across engines), cast to DECIMAL (exact, associative
  addition), sum, cast back to DOUBLE. Any summation order yields the
  same decimal, hence the same double.
- ``davg``: exact decimal sum as double, divided by the row count —
  one double division on identical operands.

Mirror SQL fragments for the DuckDB oracle are provided as
``SQL_DSUM`` / ``SQL_DAVG`` format templates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent sum of a double column, as DOUBLE."""
    return F.sum(F.round(col, scale).cast(DecimalType(18, scale))).cast("double")


def davg(col: Column, scale: int = 2) -> Column:
    """Order-independent average of a double column, as DOUBLE."""
    return dsum(col, scale) / F.count(F.lit(1))


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB fragment mirroring :func:`dsum` exactly."""
    return f"CAST(sum(CAST(round({expr}, {scale}) AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    """DuckDB fragment mirroring :func:`davg` exactly."""
    return f"({sql_dsum(expr, scale)} / count(*))"
