"""Partitioned bronze + partition pruning: the reference writes one parquet
file per dataset (engine.py:48, its one real scalability sin); our bronze
writes hive-partitioned directories and Catalyst must prune them — at 100 TB
this is the difference between scanning a day and scanning a decade."""

import contextlib
import io

from pyspark.sql import functions as F

from agentic_data_pipeline_spark.sources.bronze import read_bronze, write_bronze


def test_partitioned_bronze_prunes(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "order_year", F.year("o_orderdate"))
    lake = str(tmp_path / "lake")
    write_bronze(orders, lake, "orders_by_year", partition_by=["order_year"])

    back = read_bronze(spark, lake, "orders_by_year")
    q = back.filter(F.col("order_year") == 1997)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "order_year" in plan.split(
        "PartitionFilters")[1].splitlines()[0]

    # pruning must not change results
    expected = orders.filter(F.col("order_year") == 1997).count()
    assert q.count() == expected and expected > 0
