"""Bucketed-table co-located join: the write-once-shuffle-never layout.

Proves the scale claim at plan level: after bucketBy(orderkey) on both
fact tables, the join's physical plan contains NO Exchange (and, with
sorted buckets, no Sort), and the result is identical to the plain
shuffled join."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    from parallel_dataflow_spark.sources.bucketed import bucketed, write_bucketed
    from parallel_dataflow_spark.sources.tables import load_table

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "t_orders_b", "o_orderkey", buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        "o_orderkey",
        buckets=8,
    )

    j = bucketed(spark, "t_orders_b").join(
        bucketed(spark, "t_lineitem_b"), "o_orderkey"
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan and "SelectedBucketsCount: 8 out of 8" in plan
    # NOTE: a within-partition Sort remains — since Spark 3.0 the reader
    # ignores bucket-sort metadata unless the legacy
    # bucketedTableScan.outputOrdering conf is set (SPARK-28220); the
    # eliminated Exchange is the scale win, the residual Sort is a cheap
    # local pass over already-sorted files.

    # identical to the plain shuffled join
    plain = orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    )
    agg = lambda d: sorted(
        tuple(r)
        for r in d.groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
        .collect()
    )
    assert agg(j) == agg(plain)

    # groupBy on the bucket key also plans without an exchange
    g = (
        bucketed(spark, "t_lineitem_b")
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    gplan = g._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in gplan, gplan

    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
