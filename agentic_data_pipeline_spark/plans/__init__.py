from .dialect import duckdb_to_spark_sql, sql_exec

__all__ = ["sql_exec", "duckdb_to_spark_sql"]
