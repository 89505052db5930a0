"""Decompose the per-query session floor (VERDICT r13 "Next round" #1).

The 180-query bench pays ~0.25-0.4 s per query that is NOT data work:
DataFrame construction (py4j round trips), `spark.read.parquet` file
listing + schema inference, analysis/optimization, codegen compile, AQE
re-planning, job scheduling, noop commit. This probe times each layer
in isolation so the optimization targets the real component instead of
guessing:

  a. `spark.range(1)` noop               — pure action/job floor
  b. `spark.read.parquet(T)` CALL only   — listing + schema per table()
  c. fresh-DF trivial query per rep      — the bench's per-query shape
  d. reused-DF same query per rep        — (c) minus DataFrame re-build
  e. fresh-DF with memoized table()      — what catalog memoization buys

Usage: python tools/floor_probe.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _calib_mt_ms
from nthu_cs542200_parallel_programming_hw4_mapreduce_spark import registry
from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.catalog import TABLES, table
from nthu_cs542200_parallel_programming_hw4_mapreduce_spark.session import get_spark


def timeit(fn, reps):
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    return walls


def fmt(walls):
    return (
        f"min {min(walls)*1e3:7.1f} ms  med {statistics.median(walls)*1e3:7.1f} ms"
        f"  max {max(walls)*1e3:7.1f} ms"
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    reps = int(args[1]) if len(args) > 1 else 7

    spark = get_spark("floor_probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()
    noop(queries["scan_count"](spark, sf_dir))
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    print(f"calib_mt_ms {_calib_mt_ms()}")

    print("a. range(1) noop           ", fmt(timeit(lambda: noop(spark.range(1)), reps)))
    from pyspark.sql import functions as F

    print("a2 range(1e6) agg noop     ", fmt(timeit(
        lambda: noop(spark.range(1_000_000).groupBy((F.col("id") % 7).alias("k")).count()), reps)))

    for t in TABLES:
        walls = timeit(lambda t=t: spark.read.parquet(f"{sf_dir}/{t}.parquet"), reps)
        print(f"b. read.parquet({t:<10})  ", fmt(walls))

    # c. fresh-DF trivial query (agg_count shape) — the bench's per-query cost
    print("c. fresh agg_count noop    ", fmt(timeit(
        lambda: noop(queries["agg_count"](spark, sf_dir)), reps)))

    # d. reuse the SAME DataFrame across reps (skips py4j re-build + re-read)
    df = queries["agg_count"](spark, sf_dir)
    print("d. reused agg_count noop   ", fmt(timeit(lambda: noop(df), reps)))

    # e. fresh build but table() served from a pre-read dict (memoized reads)
    cache = {t: table(spark, sf_dir, t) for t in TABLES}
    import nthu_cs542200_parallel_programming_hw4_mapreduce_spark.plans.core as core_mod

    orig = core_mod.table
    core_mod.table = lambda spark, sf_dir, name: cache[name]
    try:
        print("e. memo-table agg_count    ", fmt(timeit(
            lambda: noop(queries["agg_count"](spark, sf_dir)), reps)))
    finally:
        core_mod.table = orig

    print(f"calib_mt_ms {_calib_mt_ms()}")


if __name__ == "__main__":
    main()
