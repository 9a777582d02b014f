"""Serving layer (reference app.py:226-248 rebuilt).

The reference serves (a) first-5-rows JSON (mock GET /api/v1/data/latest,
app.py:229-231), (b) whole-dataset CSV bytes (app.py:246-248), and (c)
bar-chart data (app.py:234-241). Engine-side equivalents below; anything
display-only stays with the caller.

Determinism: the reference's "first 5 rows" rides on pandas row order; a
distributed engine has no implicit order, so serve_json requires an explicit
order_by (FIXTURES.md: every LIMIT pairs with a total ORDER BY).
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .catalog import numeric_columns
from .functions.helpers import dec_sum

__all__ = ["serve_json", "serve_csv", "bar_chart_data", "preview", "numeric_columns"]


def serve_json(df: DataFrame, order_by: list[str], n: int = 5) -> list[dict]:
    """First ``n`` rows (by an explicit total order) as JSON-able records."""
    rows = df.orderBy(*order_by).limit(n).collect()
    return [r.asDict(recursive=True) for r in rows]


def serve_csv(df: DataFrame, order_by: list[str] | None = None) -> bytes:
    """Whole dataset as CSV bytes (download path; driver-side materialize —
    the scale path is ``df.write.csv``, this mirrors app.py:246-248)."""
    pdf = (df.orderBy(*order_by) if order_by else df).toPandas()
    buf = io.StringIO()
    pdf.to_csv(buf, index=False)
    return buf.getvalue().encode("utf-8")


def bar_chart_data(df: DataFrame, x: str, y: str) -> DataFrame:
    """Grouped bar-chart input: x category vs exact sum of a numeric y
    (app.py:234-241 feeds raw rows to plotly; aggregating engine-side is the
    scalable contract — never ship 100 TB to a chart)."""
    if y not in numeric_columns(df):
        raise ValueError(f"y column {y!r} is not numeric")
    return df.groupBy(F.col(x).alias("x")).agg(dec_sum(y).alias("y_sum"))


def preview(df: DataFrame, order_by: list[str], n: int = 10) -> DataFrame:
    """head(n) with a pinned total order (app.py:107,111-113 semantics)."""
    return df.orderBy(*order_by).limit(n)
