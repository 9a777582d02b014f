"""NL transformation front-end (reference agent.py rebuilt, LLM-optional).

Resolution order for a rule request (apply_business_rule):
1. a named catalog rule → the deterministic compiled implementation
   (operators/rules.py) — the reference has no deterministic path at all;
2. an injected LLM (any ``prompt -> sql`` callable; the reference pins
   ChatOpenAI gpt-3.5-turbo, agent.py:25) → markdown fences stripped
   (agent.py:46) → DuckDB-dialect shim → sql_exec against the *actual*
   current DataFrame bound as CURRENT_TABLE. This fixes the reference's
   latent bug of executing against a never-written "temp_staging" parquet
   (agent.py:47, SURVEY.md §2.1).
3. keyless keyword fallback (agent.py:53-58): rule text containing
   "filter" → first 10 rows; here with a pinned total order (the
   reference's unordered head(10) is nondeterministic on a cluster);
4. any error → identity pass-through (agent.py:49-51).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .catalog import numeric_columns
from .operators import rules
from .plans.dialect import sql_exec

LlmFn = Callable[[str], str]

SQL_PROMPT = (
    "You are a data engineer. Given a dataframe with columns {columns}, "
    "write a DuckDB SQL query to: {rule}. The table name is 'CURRENT_TABLE'. "
    "Return ONLY the SQL string."
)


def _find_col(df: DataFrame, *needles: str) -> str | None:
    for c in df.columns:
        lc = c.lower()
        if any(n in lc for n in needles):
            return c
    return None


def compile_catalog_rule(rule_name: str, df: DataFrame,
                         spark: SparkSession) -> DataFrame | None:
    """Deterministic compiler for the 4 catalog rules (agent.py:60-67)."""
    if rule_name == "clean_emails":
        col = _find_col(df, "email")
        return rules.clean_emails(df, col) if col else None
    if rule_name == "standardize_currency":
        amount = _find_col(df, "revenue", "price", "amount", "total", "sales")
        currency = _find_col(df, "currency")
        if amount and currency:
            rates = {"USD": "1.0000", "EUR": "1.0800", "GBP": "1.2600"}
            return rules.standardize_currency(df, amount, currency, rates,
                                              spark=spark)
        return None
    if rule_name == "remove_outliers":
        cols = numeric_columns(df)
        return rules.remove_outliers(df, cols) if cols else None
    if rule_name == "top_performers":
        col = _find_col(df, "sales", "revenue", "total") or \
            (numeric_columns(df)[-1] if numeric_columns(df) else None)
        return rules.top_performers(df, col) if col else None
    return None


class TransformationAgent:
    """LLM-agnostic twin of the reference TransformationAgent (agent.py:16)."""

    def __init__(self, llm: LlmFn | None = None):
        self.llm = llm

    def apply_business_rule(self, spark: SparkSession, df: DataFrame,
                            rule_description: str,
                            rule_name: str | None = None) -> DataFrame:
        try:
            if rule_name in rules.RULE_CATALOG:
                out = compile_catalog_rule(rule_name, df, spark)
                if out is not None:
                    return out
            for name, desc in rules.RULE_CATALOG.items():
                if desc.lower() == rule_description.strip().lower():
                    out = compile_catalog_rule(name, df, spark)
                    if out is not None:
                        return out
            if self.llm is not None:
                prompt = SQL_PROMPT.format(columns=df.columns,
                                           rule=rule_description)
                sql = self.llm(prompt)
                return sql_exec(spark, sql, df=df, dialect="duckdb")
            return self._keyword_fallback(df, rule_description)
        except Exception:
            # Identity pass-through on any failure (reference agent.py:49-51).
            return df

    @staticmethod
    def _keyword_fallback(df: DataFrame, rule_description: str) -> DataFrame:
        if "filter" in rule_description.lower():
            # head(10) with a pinned order (first column) for determinism.
            return df.orderBy(*df.columns[:1]).limit(10)
        return df
