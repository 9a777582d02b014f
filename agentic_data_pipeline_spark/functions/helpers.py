"""Determinism helpers shared by every operator.

Money/quantity aggregates run through DECIMAL(18,2): decimal addition is
exact and therefore order-independent, so the result is bit-identical no
matter how Spark partitions the data or in which order the DuckDB oracle
sums. The final cast back to DOUBLE is exact for values this small. This is
the engine-wide answer to SURVEY.md §7 risk 1 (float summation order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def money(col: str | Column) -> Column:
    """Exact-2dp view of a money/quantity column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dec_sum(col: str | Column) -> Column:
    """Order-independent SUM for a 2dp column, surfaced as DOUBLE."""
    return F.sum(money(col)).cast("double")


def dec_mul(a: str | Column, b: str | Column) -> Column:
    """Exact decimal product of two 2dp columns/expressions.

    Multiplying the DOUBLE columns first and casting the product to decimal
    is NOT portable: a real-arithmetic tie like 881.6050 sits just above or
    below .605 in binary, and Spark (HALF_UP on the shortest decimal repr)
    and DuckDB (round on the binary value) can disagree by a cent. Casting
    *before* multiplying keeps everything exact — no rounding ever happens.
    """
    return money(a) * money(b)


def dec_avg(col: str | Column) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided as doubles.

    Matches ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x)`` in
    the DuckDB oracle — both engines divide the same two exact numbers.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(money(c)).cast("double") / F.count(c)
