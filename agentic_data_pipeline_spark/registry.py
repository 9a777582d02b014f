"""Operator registry: the single source of truth for the engine's surface.

Every operator from SURVEY.md §2 registers here with (a) a Spark
implementation ``fn(spark, sf_dir) -> DataFrame`` and (b) optionally the
equivalent DuckDB SQL used as a correctness oracle. ``__spark_entry__.py``
re-exports this registry as the driver contract.

Determinism contract for every registered op (SURVEY.md §5):
- alias every computed column identically in Spark and oracle SQL;
- money aggregates go through DECIMAL(18,2) so sums are order-independent,
  then cast to DOUBLE at the end (exact conversion, identical both engines);
- every LIMIT is paired with a total ORDER BY including a unique tiebreaker;
- no approximate aggregates.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Op:
    op_id: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default=tuple)
    doc: str = ""


OPS: dict[str, Op] = {}


def op(op_id: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query op. ``oracle`` is DuckDB SQL or None for
    ops that are not SQL-expressible (driver then does a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if op_id in OPS:
            raise ValueError(f"duplicate op id: {op_id}")
        OPS[op_id] = Op(op_id=op_id, fn=fn, oracle=oracle,
                        tags=tags, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {k: v.fn for k, v in OPS.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {k: v.oracle for k, v in OPS.items() if v.oracle is not None}


_loaded = False


def _ensure_loaded() -> None:
    """Import every module that registers ops (decorators run on import)."""
    global _loaded
    if _loaded:
        return
    from .operators import (  # noqa: F401
        analytics, approx, cdc, dedup, flagship, multimodal, prep, profiling,
        reference_ops, rules, sampling, sessionize,
        similarity, sql_surface, streaming_ops, temporal, text, tpch_full,
    )
    _loaded = True
