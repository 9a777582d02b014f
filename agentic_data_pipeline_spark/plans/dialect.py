"""SQL execution + DuckDB-dialect shim (reference engine.py:58-63).

The reference substitutes the magic token ``CURRENT_TABLE`` with a parquet
file path *string* inside the SQL text, then hands it to DuckDB. Here the
binding is a temp view, so Catalyst resolves the name like any relation —
parse → analyze → optimize → whole-stage-codegen, no string surgery.

Because the LLM front-end is prompted for DuckDB SQL (agent.py:42) and the
correctness oracle *is* DuckDB, a tiny pre-parse rewrite absorbs the dialect
deltas that matter in practice. Kept deliberately minimal (SURVEY.md §2.2):
declared queries are written in the common subset; this shim only rescues
the LLM path.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from ..catalog import bind_current_table
from ..session import tune

# DuckDB → Spark SQL function/dialect rewrites (word-boundary, case-insensitive).
_FN_REWRITES: list[tuple[re.Pattern[str], str]] = [
    # json_extract_string(j, p)  →  get_json_object(j, p)
    (re.compile(r"\bjson_extract_string\s*\(", re.I), "get_json_object("),
    # string_split(s, sep)[n]  →  element_at(split(s, sep), n):
    # DuckDB list indexing is 1-based, Spark's [] is 0-based, but Spark's
    # element_at is 1-based — preserving the LLM's index semantics.
    # (Non-nested args only — good enough for LLM-shaped SQL.)
    (re.compile(r"\bstring_split\s*\(([^()]*)\)\s*\[\s*(\d+)\s*\]", re.I),
     r"element_at(split(\1), \2)"),
    # string_split(s, sep)  →  split(s, sep)   (Spark's split takes a regex,
    # identical for the single-char separators the LLM emits)
    (re.compile(r"\bstring_split\s*\(", re.I), "split("),
    # list_* family → array_* / aggregate equivalents that exist in Spark
    (re.compile(r"\blist_contains\s*\(", re.I), "array_contains("),
    (re.compile(r"\blen\s*\(", re.I), "length("),
    # DuckDB's log() is log10; Spark's is ln. Map explicitly.
    (re.compile(r"\blog\s*\(", re.I), "log10("),
    (re.compile(r"\bln\s*\(", re.I), "ln("),
    # DuckDB integer floor-division operator → Spark's div keyword.
    (re.compile(r"//"), " div "),
]

# Dialect deltas that need NO rewrite (documented so future-me doesn't add
# one): GROUP BY ALL is native in Spark ≥3.4; `/` is float division in both
# (ANSI); CURRENT_TABLE resolves via the temp view, not string surgery.

_MD_FENCE = re.compile(r"^```(?:sql)?\s*|\s*```$", re.I | re.M)


def strip_markdown_fences(sql: str) -> str:
    """LLMs wrap SQL in ``` fences; strip them (reference agent.py:46)."""
    return _MD_FENCE.sub("", sql).strip().rstrip(";")


def duckdb_to_spark_sql(sql: str) -> str:
    """Best-effort DuckDB→Spark dialect rewrite for LLM-generated SQL."""
    out = strip_markdown_fences(sql)
    for pat, repl in _FN_REWRITES:
        out = pat.sub(repl, out)
    return out


def sql_exec(spark: SparkSession, query: str, df: DataFrame | None = None,
             dialect: str = "spark") -> DataFrame:
    """Run SQL with the reference's one-table convention.

    ``df`` (if given) is bound as ``CURRENT_TABLE`` — fixing the reference's
    latent bug where the AI path executed against a never-written
    "temp_staging" parquet (agent.py:47, SURVEY.md §2.1) — and any other
    registered temp view remains addressable (multi-table superset).
    """
    tune(spark)
    if df is not None:
        bind_current_table(spark, df)
    if dialect == "duckdb":
        query = duckdb_to_spark_sql(query)
    return spark.sql(query)
