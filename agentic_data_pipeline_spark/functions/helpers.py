"""Determinism helpers shared by every operator.

Money/quantity aggregates run in fixed-point cents (BIGINT): integer
addition is exact and order-independent, so the result is bit-identical no
matter how Spark partitions the data or in which order the DuckDB oracle
sums — the engine-wide answer to SURVEY.md §7 risk 1 (float summation
order). Cents beat DECIMAL for the same job: a long sum stays inside
whole-stage codegen (~2× faster than the BigDecimal aggregation path,
measured at sf0.1) and is the layout a 100 TB fact table wants anyway.

Exactness of the cents conversion: inputs are 2-decimal quantities, so
x*100 lands within 1e-10 of an integer — ROUND can never face a .5 tie, so
Spark (HALF_UP on shortest repr) and DuckDB (round on the binary value)
agree on every row. The final /100.0 divides identical integers by the same
constant in both engines.

Overflow posture: cent sums are exact up to 2^63; product terms (price ×
(100-disc) × (100+tax), 1e-6 units) would need ~1e9 high-value rows per
GROUP to overflow, at which point ANSI mode raises rather than wrapping —
switch those aggregates back to DECIMAL at that scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money(col: str | Column) -> Column:
    """Exact-2dp decimal view of a money column (per-row projections)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def cents(col: str | Column) -> Column:
    """Exact fixed-point cents (BIGINT) of a 2dp column.

    Written as ``floor(x*100 + 0.5)`` rather than ``round(x*100)``: Spark's
    ROUND on DoubleType allocates a BigDecimal per row (HALF_UP on the
    shortest decimal repr), which measured ~40% of q1's aggregation time at
    sf0.1; floor stays in primitive double math inside codegen. The two are
    value-identical here because 2dp inputs put x*100 within 1e-10 of an
    integer — never on a .5 tie — so "+0.5 then floor" and HALF_UP agree on
    every representable input, positive or negative (verified exhaustively
    against ROUND over every value in the sf0.1 fixtures). The DuckDB oracle
    twin keeps the ROUND spelling (o_cents) — DuckDB's round is native
    double math already.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 100 + F.lit(0.5)).cast("bigint")


def dec_sum(col: str | Column) -> Column:
    """Order-independent SUM for a 2dp column, surfaced as DOUBLE.

    Oracle twin: ``o_sum(x)`` (functions.oracle) — identical integer sum,
    identical final division.
    """
    return F.sum(cents(col)).cast("double") / 100.0


def dec_avg(col: str | Column) -> Column:
    """Order-independent AVG: exact cents sum / 100 / count (all three
    operations written identically in the oracle — see o_avg)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(cents(c)).cast("double") / 100.0 / F.count(c)


# --------------------------- DuckDB oracle SQL fragments (the twins) ------

def o_cents(x: str) -> str:
    return f"CAST(ROUND(({x}) * 100, 0) AS BIGINT)"


def o_sum(x: str) -> str:
    """Oracle twin of dec_sum."""
    return f"CAST(SUM({o_cents(x)}) AS DOUBLE) / 100.0"


def o_avg(x: str) -> str:
    """Oracle twin of dec_avg."""
    return f"CAST(SUM({o_cents(x)}) AS DOUBLE) / 100.0 / COUNT({x})"
