"""Bucketed co-located joins: pre-bucketing both fact tables on the join
key lets Catalyst plan a sort-merge join with NO Exchange on either side —
at 100 TB this turns the biggest repeated shuffle (fact⋈fact on orderkey)
into a partition-local merge. (README scale notes; the lake/bronze design
would bucket lineitem+orders at ingest time.)"""

import contextlib
import io


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").saveAsTable("b_orders"))
    (lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
     .sortBy("l_orderkey").saveAsTable("b_lineitem"))

    # disable broadcast so the join must choose a shuffle or bucket merge
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            spark.table("b_lineitem")["l_orderkey"]
            == spark.table("b_orders")["o_orderkey"])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan          # both sides pre-bucketed
        # and the join is still correct
        assert j.count() == lineitem.join(
            orders, lineitem["l_orderkey"] == orders["o_orderkey"]).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
