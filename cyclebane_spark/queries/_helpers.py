"""Shared helpers for oracle-parity queries.

Double-precision aggregates are the classic parity trap: Spark and DuckDB sum
partitions in different orders, so ``SUM(double)`` can differ in the last ulp.
All SUM/AVG of doubles therefore route through an exact decimal accumulator
(order-independent) and cast back to double — both engines then produce
bit-identical results. Single double *operations* (one multiply, one divide)
are IEEE-deterministic given identical operands and need no special handling.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Scale-4 covers products of 2-decimal money columns exactly.
DEC = 'decimal(28,6)'


def dsum(col: Column | str) -> Column:
    """Exact, order-independent sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast('double')


def davg(col: Column | str) -> Column:
    """avg as exact-sum / count: identical operands → identical IEEE divide."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast('double') / F.count(c)


def sql_dsum(expr: str) -> str:
    return f'CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE)'


def sql_davg(expr: str) -> str:
    return f'(CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE) / COUNT({expr}))'
