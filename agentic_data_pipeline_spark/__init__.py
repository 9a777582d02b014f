"""agentic_data_pipeline_spark — a PySpark-native analytics engine with the
capability surface of Macropolo-s/agentic-data-pipeline (see SURVEY.md).

Layers:
- session/catalog: configured SparkSession + multi-table parquet lake
- sources: multi-format ingestion + bronze zone (reference engine.py)
- plans: SQL execution, CURRENT_TABLE binding, DuckDB-dialect shim
- operators: the verified operator inventory (SQL surface, business rules,
  dedup, similarity, text analysis, multimodal)
- streaming: Structured Streaming twin of the batch window ops
- agent: LLM-optional NL rule front-end (reference agent.py)
- registry: op_id → (Spark impl, DuckDB oracle) — the driver contract
"""

from .catalog import load_table, numeric_columns, register_views
from .registry import all_oracles, all_ops_queries, all_queries
from .session import get_spark, tune

__all__ = [
    "get_spark", "tune", "load_table", "register_views", "numeric_columns",
    "all_queries", "all_oracles", "all_ops_queries",
]

__version__ = "0.1.0"
