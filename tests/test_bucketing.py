"""Bucketing: pre-shuffled table layout so repeated joins on the bucket
key need no exchange at all — the co-located-join primitive for a
100 TB fact table joined every day on the same key."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.catalog import table


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    (orders.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_b"))
    (customer.write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_b"))
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_has_no_exchange(spark, sf_dir, warehouse):
    """With broadcast off (the 100 TB case: both sides too big), the
    bucketed join must plan with NO Exchange before the join — both
    scans are already hash-partitioned on the key."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob, cb = spark.table("orders_b"), spark.table("customer_b")
        joined = ob.join(cb, ob.o_custkey == cb.c_custkey)
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, sf_dir, warehouse):
    ob, cb = spark.table("orders_b"), spark.table("customer_b")
    bucketed = ob.join(cb, ob.o_custkey == cb.c_custkey).count()
    plain = (
        table(spark, sf_dir, "orders")
        .join(table(spark, sf_dir, "customer"),
              F.col("o_custkey") == F.col("c_custkey"))
        .count()
    )
    assert bucketed == plain
