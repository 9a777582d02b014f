"""Local twin of the driver's DuckDB-oracle comparison (SURVEY.md §5.3):
row-count + column names + order-insensitive canonical value comparison.
Stricter than needed is fine — if this passes, the driver's hash should.
"""

from __future__ import annotations

import datetime
import math

import duckdb

from agentic_data_pipeline_spark.catalog import TABLES, table_path


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect(database=":memory:")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _canon(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def canonical_rows(pdf) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_canon(pdf[c].iloc[i]) for c in cols)
        for i in range(len(pdf))
    ]
    return sorted(rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle: str) -> None:
    got = spark_df.toPandas()
    exp = con.execute(oracle).df()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"column mismatch: spark={sorted(got.columns)} duck={sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"row count: spark={len(got)} duck={len(exp)}"
    g, e = canonical_rows(got), canonical_rows(exp)
    mism = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b][:5]
    assert g == e, (
        f"value mismatch ({len([1 for a, b in zip(g, e) if a != b])} rows); "
        f"first diffs: {mism}"
    )
