"""Data-quality expectation suite (Deequ/Great-Expectations-style gate).

A production ingestion pipeline runs constraint checks BEFORE data is
admitted to the lake: uniqueness of keys, completeness of required
columns, accepted-value domains, numeric ranges, referential integrity,
and cross-column ordering invariants. The reference's ingest path
(reference engine.py:23-37) validates only "did the file parse"; this
module is the scale-grade generalization: declarative expectations
evaluated as conditional aggregates in a single pass per table, emitted
as one row per expectation (name, table, metric, passed) so a pipeline
can gate on ``bool_and(passed)`` and a human can read the violation
counts.

Scale shape (100 TB):
- per-table checks are ONE column-pruned scan each with map-side
  conditional aggregation — no shuffle beyond the final 1-row reduce;
- the lineitem↔orders checks (referential integrity + ship-date-before-
  order-date) share ONE left join on the join key both tables are
  naturally clustered on — orphan detection is `o_orderkey IS NULL` in
  the same pass, so RI costs no extra scan;
- orders→customer RI is a broadcast anti-join (customer is the small
  dim side).

The suite intentionally includes a check the synthetic lake FAILS
(lineitem.l_shipdate earlier than its order's o_orderdate — ~19% of
rows at every SF), so the op demonstrably detects violations rather
than vacuously passing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import op

C = F.col

_ACCEPTED_STATUS = ("O", "F", "P")


def expectation_suite(orders: DataFrame, customer: DataFrame,
                      lineitem: DataFrame) -> DataFrame:
    """Evaluate the expectation suite; returns one row per expectation:
    (expectation, tbl, metric, passed). ``metric`` is the violation
    count (or duplicate count for uniqueness) as DOUBLE; ``passed`` is
    metric == 0."""
    def viol(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("double")

    o = orders.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).cast("double")
        .alias("orders_orderkey_unique"),
        viol(C("o_custkey").isNull()).alias("orders_custkey_complete"),
        viol(~C("o_orderstatus").isin(*_ACCEPTED_STATUS))
        .alias("orders_status_accepted"),
        viol(C("o_totalprice") <= 0).alias("orders_totalprice_positive"),
    )

    # orders → customer referential integrity: broadcast anti-join
    # (customer is the dimension side; at 100 TB it is still the small
    # side of this check by construction). NULL probe keys are excluded
    # here — completeness already counts them — so the Spark anti-join
    # and the SQL NOT IN oracle agree on NULL-bearing data (NOT IN
    # returns no rows when either side holds a NULL).
    o_ri = (orders.filter(C("o_custkey").isNotNull())
            .join(F.broadcast(customer.select("c_custkey")),
                  C("o_custkey") == C("c_custkey"), "left_anti")
            .agg(F.count(F.lit(1)).cast("double")
                 .alias("orders_custkey_ri")))

    # lineitem-LOCAL range checks get their own column-pruned scan,
    # deliberately NOT piggybacked on the orders join: a duplicated
    # o_orderkey upstream would multiply joined lineitem rows and inflate
    # these counts — and a quality gate must stay exact precisely when
    # upstream keys are broken. One extra map-only scan is the price.
    li_local = lineitem.agg(
        viol((C("l_quantity") < 1) | (C("l_quantity") > 50))
        .alias("lineitem_quantity_range"),
        viol((C("l_discount") < 0) | (C("l_discount") > 0.1))
        .alias("lineitem_discount_range"),
    )

    # lineitem → orders RI + the cross-table ordering invariant share ONE
    # left join on the natural cluster key (orphan = NULL right side; the
    # ship-date check per joined pair, which is per-lineitem-row when the
    # key is unique and deliberately counts every violating pair when it
    # is not).
    li_join = (lineitem.select("l_orderkey", "l_shipdate")
               .join(orders.select("o_orderkey", "o_orderdate"),
                     C("l_orderkey") == C("o_orderkey"), "left")
               .agg(
                   viol(C("o_orderkey").isNull())
                   .alias("lineitem_orderkey_ri"),
                   viol(C("o_orderkey").isNotNull()
                        & (C("l_shipdate") < C("o_orderdate")))
                   .alias("lineitem_ship_after_order"),
               ))

    wide = (o.crossJoin(F.broadcast(o_ri))
            .crossJoin(F.broadcast(li_local))
            .crossJoin(F.broadcast(li_join)))
    tbl_of = {
        "orders_orderkey_unique": "orders",
        "orders_custkey_complete": "orders",
        "orders_status_accepted": "orders",
        "orders_totalprice_positive": "orders",
        "orders_custkey_ri": "orders",
        "lineitem_quantity_range": "lineitem",
        "lineitem_discount_range": "lineitem",
        "lineitem_orderkey_ri": "lineitem",
        "lineitem_ship_after_order": "lineitem",
    }
    stack_args = ", ".join(
        f"'{name}', '{tbl_of[name]}', {name}" for name in tbl_of)
    return (wide.selectExpr(
        f"stack({len(tbl_of)}, {stack_args}) AS "
        "(expectation, tbl, metric)")
        .select("expectation", "tbl", "metric",
                (C("metric") == 0).alias("passed"))
        .orderBy("expectation"))


_EXPECTATIONS_ORACLE = f"""
WITH o AS (
    SELECT CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS DOUBLE)
               AS orders_orderkey_unique,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS DOUBLE) AS orders_custkey_complete,
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                         THEN 1 ELSE 0 END) AS DOUBLE)
               AS orders_status_accepted,
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                AS DOUBLE) AS orders_totalprice_positive
    FROM orders
),
o_ri AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS orders_custkey_ri
    FROM orders
    WHERE o_custkey IS NOT NULL
      AND o_custkey NOT IN (SELECT c_custkey FROM customer
                            WHERE c_custkey IS NOT NULL)
),
li_local AS (
    SELECT CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                         THEN 1 ELSE 0 END) AS DOUBLE)
               AS lineitem_quantity_range,
           CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                         THEN 1 ELSE 0 END) AS DOUBLE)
               AS lineitem_discount_range
    FROM lineitem
),
li_join AS (
    SELECT CAST(SUM(CASE WHEN ord.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS DOUBLE) AS lineitem_orderkey_ri,
           CAST(SUM(CASE WHEN ord.o_orderkey IS NOT NULL
                          AND l.l_shipdate < ord.o_orderdate
                         THEN 1 ELSE 0 END) AS DOUBLE)
               AS lineitem_ship_after_order
    FROM lineitem l LEFT JOIN orders ord ON l.l_orderkey = ord.o_orderkey
),
wide AS (SELECT * FROM o, o_ri, li_local, li_join),
stacked AS (
    SELECT 'orders_orderkey_unique' AS expectation, 'orders' AS tbl,
           orders_orderkey_unique AS metric FROM wide
    UNION ALL SELECT 'orders_custkey_complete', 'orders',
           orders_custkey_complete FROM wide
    UNION ALL SELECT 'orders_status_accepted', 'orders',
           orders_status_accepted FROM wide
    UNION ALL SELECT 'orders_totalprice_positive', 'orders',
           orders_totalprice_positive FROM wide
    UNION ALL SELECT 'orders_custkey_ri', 'orders',
           orders_custkey_ri FROM wide
    UNION ALL SELECT 'lineitem_quantity_range', 'lineitem',
           lineitem_quantity_range FROM wide
    UNION ALL SELECT 'lineitem_discount_range', 'lineitem',
           lineitem_discount_range FROM wide
    UNION ALL SELECT 'lineitem_orderkey_ri', 'lineitem',
           lineitem_orderkey_ri FROM wide
    UNION ALL SELECT 'lineitem_ship_after_order', 'lineitem',
           lineitem_ship_after_order FROM wide
)
SELECT expectation, tbl, metric, metric = 0 AS passed
FROM stacked ORDER BY expectation
"""


@op("ext_expectations", oracle=_EXPECTATIONS_ORACLE)
def ext_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite over the lake's core tables: key
    uniqueness, required-column completeness, accepted-value domain,
    numeric ranges, two referential-integrity checks, and the cross-table
    ship-date-after-order-date invariant (which the synthetic lake
    genuinely violates — the suite reports it as failed with the exact
    violation count). One row per expectation; a pipeline gates on
    ``bool_and(passed)``."""
    return expectation_suite(load_table(spark, sf_dir, "orders"),
                             load_table(spark, sf_dir, "customer"),
                             load_table(spark, sf_dir, "lineitem"))
