"""Multi-join analytic query shapes over the star schema.

The reference's query surface is "whatever SQL the LLM emits" against the
catalog (reference engine.py:58-63 executes arbitrary DuckDB SQL; SURVEY.md
§2.2 makes joins first-class because our catalog is multi-table). These ops
pin the three classic TPC-H-style plan shapes a warehouse engine must get
right at 100 TB — deep dim-chain joins with selective fact filters — plus a
MERGE-style upsert (the write-side sibling of the read-side joins).

Physical-plan intent (asserted in tests/test_plans.py):
- dims (region/nation/customer-filtered) broadcast — no shuffle of the fact;
- the one unavoidable fact shuffle is on the aggregation key, post-filter;
- top-k ordering is TakeOrderedAndProject, never a global sort.

Money math runs in fixed-point cents (functions.helpers) so every sum is
order-independent and hash-parity with DuckDB is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.helpers import cents
from ..registry import op

C = F.col

# Oracle fragment: exact cents revenue sum ext*(1-disc), surfaced as DOUBLE.
_O_REVENUE = """CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)))
                AS DOUBLE) / 10000.0"""


def _revenue() -> F.Column:
    """Exact cents revenue: sum(ext_c * (100 - disc_c)) / 1e4, as DOUBLE."""
    return (F.sum(cents("l_extendedprice") * (100 - cents("l_discount")))
            .cast("double") / 10000.0)


@op("q3_shipping_priority", oracle=f"""
    SELECT l_orderkey,
           {_O_REVENUE} AS revenue,
           o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01'
      AND l_shipdate  > TIMESTAMP '1998-07-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
""")
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped orders by revenue for one segment.

    Plan: the filtered customer dim (1 segment ≈ 1/5 of customers) is
    broadcast into orders, that join result (still fact-sized, so it stays
    partitioned) joins lineitem on the orderkey, aggregates on the same
    key, and the final ordering is TakeOrderedAndProject (k=10 heap per
    partition + driver merge — no global sort even at 100 TB).
    """
    cust = (load_table(spark, sf_dir, "customer")
            .filter(C("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    orders = (load_table(spark, sf_dir, "orders")
              .filter(C("o_orderdate") < F.lit("1998-07-01").cast("timestamp_ntz"))
              .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"))
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(C("l_shipdate") > F.lit("1998-07-01").cast("timestamp_ntz"))
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    return (
        orders.join(F.broadcast(cust), C("o_custkey") == C("c_custkey"))
        .join(li, C("l_orderkey") == C("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(C("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@op("q5_local_supplier_volume", oracle=f"""
    SELECT n_name,
           {_O_REVENUE} AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
""")
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where customer and supplier share
    the nation, one region, two-year window — the canonical 6-way join.

    Plan: the whole dim side (region→nation→supplier, plus customer) is
    small relative to the facts, so every dim broadcasts; lineitem joins
    orders on the orderkey (the one big shuffle pair), then picks up
    supplier and the customer-nation equality via broadcasts. The
    c_nationkey = s_nationkey predicate rides on the join, not a filter
    afterward — Catalyst pushes it into the broadcast hash join condition.
    """
    region = (load_table(spark, sf_dir, "region")
              .filter(C("r_name") == "ASIA").select("r_regionkey"))
    nation = load_table(spark, sf_dir, "nation")
    asia_nations = nation.join(
        F.broadcast(region), C("n_regionkey") == C("r_regionkey")
    ).select("n_nationkey", "n_name")
    supplier = (load_table(spark, sf_dir, "supplier")
                .select("s_suppkey", "s_nationkey"))
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (load_table(spark, sf_dir, "orders")
              .filter((C("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                      & (C("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")))
              .select("o_orderkey", "o_custkey"))
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"))
    return (
        li.join(orders, C("l_orderkey") == C("o_orderkey"))
        .join(F.broadcast(cust), C("o_custkey") == C("c_custkey"))
        .join(F.broadcast(supplier),
              (C("l_suppkey") == C("s_suppkey"))
              & (C("c_nationkey") == C("s_nationkey")))
        .join(F.broadcast(asia_nations), C("s_nationkey") == C("n_nationkey"))
        .groupBy("n_name")
        .agg(_revenue().alias("revenue"))
    )


@op("q10_returned_items", oracle=f"""
    SELECT c_custkey,
           c_name,
           {_O_REVENUE} AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
""")
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue from returned items.

    Plan: lineitem is pre-filtered to returns (selective, pushed to the
    scan), joins the date-windowed orders on the orderkey, then the
    customer+nation dims broadcast; the aggregation key is the customer —
    high-cardinality, so the agg shuffle is the sized-for-scale step and
    the final top-20 is TakeOrderedAndProject.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = (load_table(spark, sf_dir, "orders")
              .filter((C("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
                      & (C("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")))
              .select("o_orderkey", "o_custkey"))
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(C("l_returnflag") == "R")
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    return (
        li.join(orders, C("l_orderkey") == C("o_orderkey"))
        .join(F.broadcast(cust), C("o_custkey") == C("c_custkey"))
        .join(F.broadcast(nation), C("c_nationkey") == C("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_revenue().alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(C("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ------------------------------------------------------------ MERGE / upsert

def merge_upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """MERGE INTO semantics: matched target rows take the source version
    (whole-row update), unmatched source rows insert, unmatched target rows
    survive — i.e. the next snapshot of the table.

    Implementation: target ANTI JOIN source (rows the merge does not touch)
    UNION ALL source. Both legs shuffle on the merge key once; with bronze
    bucketed on the key (sources/bronze) both sides arrive co-located and
    the anti join is shuffle-free. This is the same physical shape Delta's
    MERGE resolves to when the match condition is an equi-key — expressed in
    plain DataFrame algebra so it works on any parquet bronze.
    """
    untouched = target.join(source, on=key, how="left_anti")
    return untouched.unionByName(source)


@op("merge_upsert", oracle="""
    WITH source AS (
        SELECT o_orderkey,
               o_custkey,
               'P'                      AS o_orderstatus,
               o_totalprice + 1.0       AS o_totalprice,
               o_orderdate,
               o_orderpriority
        FROM orders WHERE o_orderkey % 100 = 0
        UNION ALL
        SELECT 9000000 + r_regionkey, 1, 'N', 100.0 + r_regionkey,
               TIMESTAMP '2002-01-01', '1-URGENT'
        FROM region
    )
    SELECT * FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM source)
    UNION ALL
    SELECT * FROM source
""")
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE demo on orders: a CDC batch of updates (every 100th order,
    price bumped, status → 'P') plus 5 synthetic inserts, applied with
    upsert semantics. The op under test is merge_upsert(); the batch is
    derived deterministically from the fixtures so the oracle can rebuild
    the identical source set."""
    orders = load_table(spark, sf_dir, "orders")
    region = load_table(spark, sf_dir, "region")
    updates = (orders.filter(C("o_orderkey") % 100 == 0)
               .withColumn("o_orderstatus", F.lit("P"))
               .withColumn("o_totalprice", C("o_totalprice") + 1.0))
    inserts = region.select(
        (F.lit(9_000_000) + C("r_regionkey").cast("bigint")).alias("o_orderkey"),
        F.lit(1).cast("bigint").alias("o_custkey"),
        F.lit("N").alias("o_orderstatus"),
        (F.lit(100.0) + C("r_regionkey")).alias("o_totalprice"),
        F.lit("2002-01-01").cast("timestamp_ntz").alias("o_orderdate"),
        F.lit("1-URGENT").alias("o_orderpriority"),
    )
    source = updates.unionByName(inserts)
    return merge_upsert(orders, source, key="o_orderkey")


@op("q18_large_orders", oracle="""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING (CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE)
                / 100.0) > 120
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           (CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE)
            / 100.0) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 25
""")
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind the largest orders — the
    HAVING-subquery-driven join.

    Plan: the qualifying-orderkey set is computed with ONE aggregation over
    lineitem and then semi-joined back (left_semi keeps the probe side
    unduplicated); the outer aggregation re-groups only the qualifying
    lineitems. At 100 TB both aggregations shuffle on the same key
    (l_orderkey), so the exchange is reused across the two passes rather
    than re-partitioned; the customer dim broadcasts into the final result.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (li.groupBy("l_orderkey")
           .agg((F.sum(cents("l_quantity")).cast("double") / 100.0)
                .alias("qty"))
           .filter(C("qty") > 120)
           .select("l_orderkey"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    qualifying = li.join(
        big.withColumnRenamed("l_orderkey", "b_orderkey"),
        C("l_orderkey") == C("b_orderkey"), "left_semi")
    return (
        qualifying.join(orders, C("l_orderkey") == C("o_orderkey"))
        .join(F.broadcast(cust), C("o_custkey") == C("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate")
        .agg((F.sum(cents("l_quantity")).cast("double") / 100.0)
             .alias("total_qty"))
        .orderBy(C("total_qty").desc(), "o_orderkey")
        .limit(25)
    )
