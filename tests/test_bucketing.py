"""Bucketed co-located joins must plan without a shuffle (Exchange)
on either side — the SCALE.md claim, asserted on the physical plan."""

from pyspark.sql import functions as F

from gmall_flink_2021_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from gmall_flink_2021_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, SF_SMOKE, "orders")
        lineitem = load_table(spark, SF_SMOKE, "lineitem")
        write_bucketed(orders, "b_orders", "o_orderkey")
        write_bucketed(lineitem, "b_lineitem", "l_orderkey")

        joined = bucketed_join(spark, "b_orders", "b_lineitem",
                               "o_orderkey", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and the result is right
        expect = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey).count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")