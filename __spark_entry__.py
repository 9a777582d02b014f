"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``agentic_data_pipeline_spark``; this file only
adapts the registry to the contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    from agentic_data_pipeline_spark.operators.flagship import q1_pricing_summary
    from agentic_data_pipeline_spark.session import tune

    tune(spark)
    return q1_pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (see registry)."""
    from agentic_data_pipeline_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible op; ops without an entry get
    the driver's weaker rows-only check (non-SQL-expressible: hash-based
    fuzzy dedup, LSH ANN, model/binary-backed ops)."""
    from agentic_data_pipeline_spark.registry import all_oracles

    return all_oracles()
