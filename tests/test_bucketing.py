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


def test_zorder_layout_skips_both_dimensions(spark, sf_dir, tmp_path):
    """Writing range-partitioned by the Z-value gives every file a tight
    min/max envelope in BOTH interleaved keys, so footer-stats skipping
    works for predicates on either column; a single-key layout leaves the
    second column's per-file span near the full range. Measured on real
    parquet footers via pyarrow."""
    import glob

    import pyarrow.parquet as pq

    from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.core import zvalue

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # scale both keys to the 16-bit domain before interleaving, as the
    # declared query does (unscaled keys degenerate to single-key order)
    import pyspark.sql.functions as SF
    st = li.agg(
        SF.min("l_orderkey").alias("omin"), SF.max("l_orderkey").alias("omax"),
        SF.min("l_partkey").alias("pmin"), SF.max("l_partkey").alias("pmax"))
    with_z = li.crossJoin(SF.broadcast(st)).select(
        "l_orderkey", "l_partkey",
        zvalue(
            SF.expr("((l_orderkey - omin) * 65535) div greatest(omax - omin, 1)"),
            SF.expr("((l_partkey - pmin) * 65535) div greatest(pmax - pmin, 1)"),
        ).alias("z"))
    a = str(tmp_path / "by_z")
    b = str(tmp_path / "by_orderkey")
    with_z.repartitionByRange(8, "z").write.parquet(a)
    with_z.repartitionByRange(8, "l_orderkey").write.parquet(b)

    def mean_span(path, col):
        spans, lo, hi = [], [], []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            mins = [md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups)]
            maxs = [md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups)]
            spans.append(max(maxs) - min(mins))
            lo.append(min(mins)); hi.append(max(maxs))
        return sum(spans) / len(spans) / max(1, (max(hi) - min(lo)))  # span as fraction of full range

    # partkey skipping: z-layout files cover a strict subset of the range;
    # orderkey-layout files each cover essentially all of it
    frac_z = mean_span(a, "l_partkey")
    frac_1d = mean_span(b, "l_partkey")
    assert frac_1d > 0.9, frac_1d
    assert frac_z < 0.75 * frac_1d, (frac_z, frac_1d)
    # and the z-layout still bounds orderkey too (both dims cluster)
    assert mean_span(a, "l_orderkey") < 0.75, mean_span(a, "l_orderkey")
