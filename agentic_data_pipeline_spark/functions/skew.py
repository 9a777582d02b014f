"""Skew-mitigation join helper (100 TB toolbox).

AQE's skew-join splitting handles most skew at runtime — measured on a
12 M-row hot-key join it beat manual salting outright (BASELINE.md), so
salting is NOT a default. It is the explicit fallback for the shapes AQE
cannot split: hot keys feeding an aggregation, or a join whose skewed
partition can't be subdivided (single monster key on a non-broadcastable
right side). The left (skewed) side gets a
random-free deterministic salt derived from a high-entropy column; the right
side is replicated once per salt bucket — turning one hot partition into
``salt`` evenly-loaded ones at the cost of replicating the right side's
matching rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(left: DataFrame, right: DataFrame, key: str,
                salt: int = 16, how: str = "inner",
                entropy_col: str | None = None) -> DataFrame:
    """Equi-join on ``key`` with the left side salted into ``salt`` buckets.

    ``entropy_col`` picks the column whose hash spreads the hot key's rows
    (default: all left columns — deterministic, no rand(), so retries and
    speculative tasks stay consistent).
    """
    seed_cols = [F.col(entropy_col)] if entropy_col else [
        F.col(c) for c in left.columns
    ]
    salted_l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*seed_cols), F.lit(salt)).cast("int")
    )
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(salt)])
    ).alias("__salt")
    salted_r = right.select("*", salts)
    out = salted_l.join(salted_r, [key, "__salt"], how)
    return out.drop("__salt")
